"""Run the BASELINE.json config ladder (configs0..3) on one dataset and
report per-rung metrics — the ablation-monotonicity oracle of SURVEY.md §4.1:
each rung should improve validation AUC over the previous.

Usage: python scripts/ladder.py [out_json] [dataset] [epochs]
"""

import json
import sys
import time

sys.path.insert(0, ".")

from score_tpu.config import PRESETS
from score_tpu.data.prep_datasets import PREP
from score_tpu.train import train


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ladder.json"
    dataset = sys.argv[2] if len(sys.argv) > 2 else "taobao"
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    ds = PREP[dataset](f"/tmp/score_tpu_data/ladder_{dataset}",
                       synth_kw=dict(num_users=3000, num_items=6000,
                                     num_events=400_000, mode="collab"))
    print(f"{dataset}: users={ds.num_users} items={ds.num_items} "
          f"train={len(ds.train)}", flush=True)

    results = {}
    for name in ("configs0", "configs1", "configs2", "configs3"):
        cfg = PRESETS[name]()
        cfg = cfg.replace(train=cfg.train.__class__(
            batch_size=512, learning_rate=1e-3, num_epochs=epochs,
            eval_every_steps=300, early_stop_patience=6,
            log_every_steps=10 ** 9, seed=0))
        t0 = time.time()
        out = train(cfg, ds, verbose=False)
        results[name] = dict(
            best_val_auc=out["best_val_auc"],
            test=out["test"], steps=out["steps_run"],
            wall_s=round(time.time() - t0, 1))
        print(f"{name}: val_auc={out['best_val_auc']:.4f} "
              f"test_auc={out['test']['auc']:.4f} "
              f"ndcg@10={out['test']['ndcg@10']:.4f} "
              f"wall={results[name]['wall_s']}s", flush=True)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    aucs = [results[n]["best_val_auc"] for n in
            ("configs0", "configs1", "configs2", "configs3")]
    print("ladder val AUCs:", [round(a, 4) for a in aucs], flush=True)
    print("monotone:", all(b >= a - 0.002 for a, b in zip(aucs, aucs[1:])),
          flush=True)


if __name__ == "__main__":
    main()
