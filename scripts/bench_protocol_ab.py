"""Protocol-vs-code split of the driver bench number (VERDICT.md r3 #5).

bench.py r3 takes best-of-2 train windows (a floor measurement, justified
by the measured 30-50% relay drift); r1/r2 timed a single window. This
script runs N windows of the IDENTICAL train loop in one process and
reports, on the same samples:

  single_window   each window's rate (the r1/r2 protocol: mean/median/sd)
  best_of_2       max over adjacent window pairs (the r3 protocol)
  best_of_all     max over all windows (upper bound of the floor protocol)

best_of_2_mean / single_mean is the pinned "the best-of protocol adds X%
on identical code" number; the honest code-only speedup vs the 75.2k r1
pin is single-window mean (r1 was one window).

Usage: python scripts/bench_protocol_ab.py [out_json] [n_windows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

# bench.py's exact knobs
import bench as B


def main():
    import jax
    import jax.numpy as jnp

    from score_tpu.config import configs3
    from score_tpu.data import synth
    from score_tpu.data.prep_common import build_dataset
    from score_tpu.data.pipeline import TargetIterator
    from score_tpu.graph import device_graph
    from score_tpu.train import (_stack_batches, build_model, init_state,
                                 item_importance_weights, make_train_loop)

    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_ab.json"
    n_windows = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    user, item, ts = synth.synth_events(
        B.NUM_USERS, B.NUM_ITEMS, B.NUM_EVENTS, num_slots=B.NUM_SLOTS,
        seed=0)
    ds = build_dataset(user, item, ts, num_slots=B.NUM_SLOTS,
                       user_fanout=B.FANOUT, item_fanout=B.FANOUT,
                       num_eval_neg=B.EVAL_NEG, min_user=3, min_item=3,
                       seed=0, dataset_name="bench-taobao")
    cfg = configs3()
    cfg = cfg.replace(model=cfg.model.__class__(
        embed_dim=B.EMBED_DIM, hidden_dim=64, mlp_dims=(128, 64),
        sides="dual", slot_agg="coattn", seq_pool="attn", target_aware=True,
        compute_dtype=B.COMPUTE_DTYPE),
        data=cfg.data.__class__(train_neg_mode=B.NEG_MODE),
        train=cfg.train.__class__(batch_size=B.BATCH))
    graph = device_graph(ds.graph)
    model = build_model(cfg, ds.num_users, ds.num_items)
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, model, graph, rng)
    neg_iw = jnp.asarray(item_importance_weights(ds.train, ds.num_items))
    train_loop = make_train_loop(model, cfg, neg_iw=neg_iw)
    it = TargetIterator(ds.train, B.BATCH, seed=0)

    K = B.STEPS_PER_CALL
    state, ms = train_loop(state, graph, _stack_batches(it, K), rng)
    float(ms["loss"][-1])                     # warmup + compile

    rates = []
    for w in range(n_windows):
        stacks = [_stack_batches(it, K) for _ in range(B.TRAIN_CALLS)]
        t1 = time.time()
        for s in stacks:
            state, ms = train_loop(state, graph, s, rng)
        float(ms["loss"][-1])
        dt = time.time() - t1
        rates.append(B.BATCH * B.TRAIN_CALLS * K / dt)
        print(json.dumps(dict(window=w, examples_per_s=round(rates[-1], 1))),
              flush=True)
        time.sleep(1.0)

    r = np.array(rates)
    bo2 = np.maximum(r[:-1:2], r[1::2]) if len(r) >= 2 else r
    result = dict(
        windows=[round(x, 1) for x in rates],
        single_window=dict(mean=round(float(r.mean()), 1),
                           median=round(float(np.median(r)), 1),
                           sd=round(float(r.std()), 1)),
        best_of_2=dict(mean=round(float(bo2.mean()), 1),
                       values=[round(float(x), 1) for x in bo2]),
        best_of_all=round(float(r.max()), 1),
        protocol_uplift_best2_over_single=round(
            float(bo2.mean() / r.mean()), 4),
        protocol_uplift_bestall_over_single=round(
            float(r.max() / r.mean()), 4),
        config=dict(batch=B.BATCH, steps_per_call=K,
                    calls_per_window=B.TRAIN_CALLS,
                    dtype=B.COMPUTE_DTYPE, neg_mode=B.NEG_MODE),
    )
    print(json.dumps({k: result[k] for k in
                      ("single_window", "best_of_2", "best_of_all",
                       "protocol_uplift_best2_over_single")}), flush=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
