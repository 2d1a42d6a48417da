"""Benchmark harness — prints ONE JSON line for the driver.

Metric (BASELINE.json:2, BASELINE.md protocol): training examples/s/chip on
the flagship configs3 model at Taobao-ish scale (synthetic data, the sandbox
has no network), steady-state jitted steps with block_until_ready, compile
excluded; plus p50 scoring latency over repeated small-batch forwards.

vs_baseline is measured against the pinned floor from the first recorded run
(BASELINE.md 'quality acceptance rule': targets get pinned by first runs).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Pinned by the first honest (readback-timed) TPU run (see BASELINE.md
# "Measurement caveat"): 2026-08-17, v5e 1 chip, configs3, jnp compute path.
BASELINE_EXAMPLES_PER_S: float | None = 75_231.2

# benchmark shape knobs (Taobao-ish scale per SURVEY.md §2.3 #2 at sandbox size)
NUM_USERS = 50_000
NUM_ITEMS = 100_000
NUM_EVENTS = 2_000_000
NUM_SLOTS = 9
FANOUT = 10
BATCH = 4096            # sweep (scripts/perf_sweep.py): 4096 > 2048 > 8192
EMBED_DIM = 32
COMPUTE_DTYPE = "bfloat16"  # true-bf16 activation chain; quality-gated vs
                            # f32 by scripts/bf16_quality.py (BASELINE.md)
NEG_MODE = "inbatch_iw"  # importance-weighted in-batch negatives: zero
                         # negative-side gathers/scatter-adds; quality-gated
                         # vs 'uniform' by scripts/negmode_quality.py — val
                         # AUC 0.7790 vs 0.7557 (BETTER, not just parity;
                         # BASELINE.md round-2 row)
TABLE_STRIDE = 2         # stride-K table updates + K-fold table-lr boost:
TABLE_LR_BOOST = 2.0     # the scatter-add 42% of the step runs on half the
                         # steps; 3-seed gate val AUC 0.7815 vs 0.7728 K=1
                         # (BETTER on every seed — BASELINE.md r4 row;
                         # stride4 fails its gate even boosted, not used)
STEPS_PER_CALL = 50     # K steps fused into one dispatch (lax.scan)
TRAIN_CALLS = 8
LATENCY_ITERS = 200
LATENCY_BATCH = 1
EVAL_NEG = 100


def main() -> None:
    import jax
    import jax.numpy as jnp

    from score_tpu.config import configs3
    from score_tpu.data import synth
    from score_tpu.data.prep_common import build_dataset
    from score_tpu.data.pipeline import TargetIterator
    from score_tpu.graph import device_graph
    from score_tpu.train import build_model, init_state, make_eval_step

    t0 = time.time()
    user, item, ts = synth.synth_events(
        NUM_USERS, NUM_ITEMS, NUM_EVENTS, num_slots=NUM_SLOTS, seed=0)
    ds = build_dataset(user, item, ts, num_slots=NUM_SLOTS,
                       user_fanout=FANOUT, item_fanout=FANOUT,
                       num_eval_neg=EVAL_NEG, min_user=3, min_item=3, seed=0,
                       dataset_name="bench-taobao")
    prep_s = time.time() - t0

    # dataclasses.replace, NOT __class__(...): a bare-constructor rebuild
    # silently resets every unlisted field to its dataclass default, so a
    # future default change would change what the driver measures
    # (VERDICT.md r4 weak #1; same bug class fixed in serve_bench c0fec79)
    import dataclasses
    cfg = configs3()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model, embed_dim=EMBED_DIM, hidden_dim=64,
            mlp_dims=(128, 64), sides="dual", slot_agg="coattn",
            seq_pool="attn", target_aware=True,
            compute_dtype=COMPUTE_DTYPE),
        data=dataclasses.replace(cfg.data, train_neg_mode=NEG_MODE),
        train=dataclasses.replace(cfg.train, batch_size=BATCH,
                                  table_update_every=TABLE_STRIDE,
                                  table_lr_boost=TABLE_LR_BOOST))
    graph = device_graph(ds.graph)
    model = build_model(cfg, ds.num_users, ds.num_items)
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, model, graph, rng)
    from score_tpu.train import (_stack_batches, item_importance_weights,
                                 make_train_loop)
    neg_iw = (jnp.asarray(item_importance_weights(ds.train, ds.num_items))
              if NEG_MODE == "inbatch_iw" else None)
    train_loop = make_train_loop(model, cfg, neg_iw=neg_iw)
    eval_step = make_eval_step(model)

    it = TargetIterator(ds.train, BATCH, seed=0)

    # --- training throughput: K steps per dispatch (train-loop-in-jit;
    # single-step dispatch is tunnel-latency-bound at ~1.7 ms/call).
    # IMPORTANT: timings end with a host readback of the last step's loss —
    # on this backend block_until_ready returns before execution finishes,
    # so only a data-dependent transfer gives honest wall time. loss[-1]
    # depends on the whole param chain, so it forces every step.
    K = STEPS_PER_CALL
    state, ms = train_loop(state, graph, _stack_batches(it, K), rng)
    float(ms["loss"][-1])                      # warmup + compile
    # best-of-2 timed windows (same contention-floor rationale as the
    # serving section below); every window still reads back its final loss
    step_s = float("inf")
    for _win in range(2):
        stacks = [_stack_batches(it, K) for _ in range(TRAIN_CALLS)]
        t1 = time.time()
        for s in stacks:
            state, ms = train_loop(state, graph, s, rng)
        final_loss = float(ms["loss"][-1])     # forces the full chain
        step_s = min(step_s, (time.time() - t1) / (TRAIN_CALLS * K))
    examples_per_s = BATCH / step_s

    # --- ranked-eval throughput (targets/s, each vs 1+100 candidates) ---
    # Relay-contention robustness (BASELINE.md round-3 serving A/B): the
    # relay's dispatch RTT drifts by tens of percent over minute-scale
    # windows, so a single timed rep can read 30-50% slow with zero code
    # change (r2 recorded 3943 targets/s and p50 37 ms where 12 interleaved
    # reps show 4934/23.3 at both r1 and r2 code states). Serving numbers
    # here are therefore best-of-3 spaced reps — a floor measurement of the
    # serving path, which is the quantity the A/B established as stable.
    from score_tpu.train import eval_table_cast, evaluate
    # bf16 table pre-cast for the eval path (the serving r4 gather fix,
    # applied to evaluation in r5 — same values to bf16 resolution)
    eval_params = eval_table_cast(state.params, cfg.model.compute_dtype)
    n_eval = 4096
    # warmup at the SAME max_targets: the pooled-metric graphs compile per
    # target-count shape, and a shape-cold timed call measures the compile
    # (measured 47s compile vs 0.8s eval at 4096 targets)
    ev = evaluate(eval_step, eval_params, graph, ds.val,
                  batch_size=512, max_targets=n_eval)   # compile warmup
    eval_targets_per_s = 0.0
    for _ in range(3):
        t_ev = time.time()
        ev = evaluate(eval_step, eval_params, graph, ds.val,
                      batch_size=512, max_targets=n_eval)
        eval_targets_per_s = max(eval_targets_per_s,
                                 n_eval / (time.time() - t_ev))

    # --- p50 scoring latency (small-batch forward, warm cache) ---
    ev_batch = {
        "user": jnp.asarray(ds.val.user[:LATENCY_BATCH]),
        "item": jnp.asarray(ds.val.item[:LATENCY_BATCH]),
        "slot": jnp.asarray(ds.val.slot[:LATENCY_BATCH]),
        "neg": jnp.asarray(ds.val.neg[:LATENCY_BATCH]),
    }
    scores = eval_step(state.params, graph, ev_batch)
    np.asarray(scores)                         # readback = real completion
    block_medians = []
    for _block in range(3):
        lat = []
        for _ in range(LATENCY_ITERS):
            t2 = time.time()
            scores = eval_step(state.params, graph, ev_batch)
            np.asarray(scores)
            lat.append(time.time() - t2)
        block_medians.append(float(np.median(lat) * 1e3))
        time.sleep(2.0)    # let a transient contention burst pass
    p50_ms = min(block_medians)

    n_chips = len(jax.devices())
    value = examples_per_s / n_chips
    vs = (value / BASELINE_EXAMPLES_PER_S
          if BASELINE_EXAMPLES_PER_S else 1.0)
    print(json.dumps({
        "metric": "train_examples_per_s_per_chip",
        "value": round(value, 1),
        "unit": "examples/s/chip",
        "vs_baseline": round(vs, 3),
        "extra": {
            "p50_scoring_latency_ms": round(p50_ms, 2),
            "eval_targets_per_s": round(eval_targets_per_s, 1),
            "val_auc_probe": round(ev["auc"], 4),
            "step_ms": round(step_s * 1e3, 2),
            "final_loss": round(final_loss, 4),
            "batch": BATCH,
            "chips": n_chips,
            "model": "configs3-coattn",
            "compute_dtype": COMPUTE_DTYPE,
            "table_stride": TABLE_STRIDE,
            "table_lr_boost": TABLE_LR_BOOST,
            "backend": jax.default_backend(),
            "prep_s": round(prep_s, 1),
            # per-phase attribution so a host-contended prep (the r3 73.2s
            # anomaly, VERDICT.md r3 weak #4) self-attributes in the record
            "prep_phase_s": ds.meta.get("prep_phase_s", {}),
        },
    }))


if __name__ == "__main__":
    main()
