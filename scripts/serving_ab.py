"""Serving-metric A/B harness (VERDICT.md r2 #2): measure ONLY the two
serving-side driver metrics — p50 scoring latency and ranked-eval
throughput — against an arbitrary repo checkout, so the r1 and r2 code
states can be interleaved on the same chip and relay noise separated from
real regression.

Usage: python scripts/serving_ab.py <repo_path> <tag> [repeats]

Prints one JSON line per repeat:
  {"tag": ..., "rep": i, "p50_ms": ..., "eval_targets_per_s": ...}

Protocol matches bench.py exactly: p50 over 200 single-target forwards
(1 pos + 100 candidates) with host readback; eval throughput over 4096
val targets at batch 512, shape-warmed before timing.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

repo = sys.argv[1]
tag = sys.argv[2]
repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
sys.path.insert(0, repo)

NUM_USERS = 50_000
NUM_ITEMS = 100_000
NUM_EVENTS = 2_000_000
NUM_SLOTS = 9
FANOUT = 10
EMBED_DIM = 32
LATENCY_ITERS = 200
LATENCY_BATCH = 1
N_EVAL = 4096


def main():
    import jax
    import jax.numpy as jnp

    from score_tpu.config import configs3
    from score_tpu.data import synth
    from score_tpu.data.prep_common import build_dataset
    from score_tpu.graph import device_graph
    from score_tpu.train import (build_model, evaluate, init_state,
                                 make_eval_step)

    user, item, ts = synth.synth_events(
        NUM_USERS, NUM_ITEMS, NUM_EVENTS, num_slots=NUM_SLOTS, seed=0)
    ds = build_dataset(user, item, ts, num_slots=NUM_SLOTS,
                       user_fanout=FANOUT, item_fanout=FANOUT,
                       num_eval_neg=100, min_user=3, min_item=3, seed=0,
                       dataset_name="serving-ab")
    cfg = configs3()
    cfg = cfg.replace(model=cfg.model.__class__(
        embed_dim=EMBED_DIM, hidden_dim=64, mlp_dims=(128, 64),
        sides="dual", slot_agg="coattn", seq_pool="attn", target_aware=True,
        compute_dtype="bfloat16"))
    graph = device_graph(ds.graph)
    model = build_model(cfg, ds.num_users, ds.num_items)
    state = init_state(cfg, model, graph, jax.random.PRNGKey(0))
    eval_step = make_eval_step(model)

    ev_batch = {
        "user": jnp.asarray(ds.val.user[:LATENCY_BATCH]),
        "item": jnp.asarray(ds.val.item[:LATENCY_BATCH]),
        "slot": jnp.asarray(ds.val.slot[:LATENCY_BATCH]),
        "neg": jnp.asarray(ds.val.neg[:LATENCY_BATCH]),
    }
    np.asarray(eval_step(state.params, graph, ev_batch))   # compile
    evaluate(eval_step, state.params, graph, ds.val,
             batch_size=512, max_targets=N_EVAL)           # compile

    for rep in range(repeats):
        lat = []
        for _ in range(LATENCY_ITERS):
            t0 = time.time()
            np.asarray(eval_step(state.params, graph, ev_batch))
            lat.append(time.time() - t0)
        t1 = time.time()
        evaluate(eval_step, state.params, graph, ds.val,
                 batch_size=512, max_targets=N_EVAL)
        ev_s = N_EVAL / (time.time() - t1)
        print(json.dumps({
            "tag": tag, "rep": rep,
            "p50_ms": round(float(np.median(lat) * 1e3), 2),
            "p90_ms": round(float(np.percentile(lat, 90) * 1e3), 2),
            "eval_targets_per_s": round(ev_s, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
