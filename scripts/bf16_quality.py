"""Quality gate for the bf16 mixed-precision compute path: train configs3
twice on the ladder dataset — compute_dtype float32 vs bfloat16 — same seed,
same data, and compare val/test AUC. bf16 is accepted as the bench default
only if its AUC is within run-to-run variance of f32 (BASELINE.md rule).

Usage: python scripts/bf16_quality.py [epochs]
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

from score_tpu.config import configs3
from score_tpu.data.prep_datasets import PREP
from score_tpu.train import train


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ds = PREP["taobao"]("/tmp/score_tpu_data/ladder_taobao",
                        synth_kw=dict(num_users=3000, num_items=6000,
                                      num_events=400_000, mode="collab"))
    print(f"users={ds.num_users} items={ds.num_items} "
          f"train={len(ds.train)}", flush=True)
    results = {}
    for dtype in ("float32", "bfloat16"):
        cfg = configs3()
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, compute_dtype=dtype),
            train=cfg.train.__class__(
                batch_size=512, learning_rate=1e-3, num_epochs=epochs,
                eval_every_steps=300, early_stop_patience=6,
                log_every_steps=10 ** 9, seed=0))
        t0 = time.time()
        out = train(cfg, ds, verbose=False)
        results[dtype] = dict(best_val_auc=out["best_val_auc"],
                              test_auc=out["test"]["auc"],
                              ndcg10=out["test"]["ndcg@10"],
                              wall_s=round(time.time() - t0, 1))
        print(json.dumps({dtype: results[dtype]}), flush=True)
    d = results["float32"]["best_val_auc"] - results["bfloat16"]["best_val_auc"]
    print(json.dumps(dict(val_auc_f32_minus_bf16=round(d, 5))), flush=True)


if __name__ == "__main__":
    main()
