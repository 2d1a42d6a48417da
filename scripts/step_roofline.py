"""Composed speed-of-light statement for the shipped train step
(VERDICT.md r4 #3; BASELINE.json:5's per-chip speed-of-light clause).

The 3.42x ladder is measured against the build's own first run; this pins
the step against the HARDWARE. Two compositions (per averaged step of the
shipped config: B=4096 bf16 inbatch_iw stride2+boost2 static loop):

NAIVE (microbench-composed — reported because its failure is the finding):
  t_scatter  = updates/step x the 19 ns/update microbench floor
  t_gather   = gather bytes / the 11.5 GB/s isolated d=32 gather rate
  t_stream   = cost_analysis 'bytes accessed' remainder / spec HBM BW
This sum OVERSHOOTS the measured step ~2.5x: isolated microbench rates do
not compose (in-graph gathers beat the standalone gather loop, the in-step
scatter beats its own microbench "floor" via duplicate-id coalescing, and
XLA's 'bytes accessed' counts every fusion's operand bytes, not unique HBM
traffic). Pinned as a methodological result: microbench-composed floors
are NOT lower bounds at step context.

DEFENSIBLE floor (what must happen, each term individually justified):
  t_scatter  = the r4-profiled in-step scatter time (27.7% x 15.94 ms =
               4.42 ms) — itself pinned AT its issue-bound floor in r4
               (dedup/sorted/accumulation probes all failed to beat it)
  t_gather   = unique forward table-row reads (95.4 MB f32) at [spec
               819 GB/s .. best measured random-row rate 24.8 GB/s] —
               a RANGE, since random 128-byte rows cannot hit spec BW
  t_mxu      = cost_analysis flops at the 197 TFLOP/s bf16 peak
  t_inputs   = batch int32 feed at spec BW
Everything else (the [B,T,n,d] intermediates) fits VMEM in a perfectly
fused program, so the floor charges it nothing. floor = sum; the step is
at X% = floor/measured, stated as a range over the gather-rate bound.

Usage: python scripts/step_roofline.py [out_json] [reuse=prior.json]
(TPU: compiles the single-chip step via the relay for cost_analysis; no
timed execution. reuse= skips compilation, reusing a prior run's
cost_analysis — platform-independent.)
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import numpy as np

# pinned measured quantities
STEP_MS_MEASURED = 15.94          # BENCH r4 static-alternation driver step
SCATTER_NS_PER_UPDATE = 19.0      # BASELINE.md r1 scatter roofline (flat)
GATHER_GBPS_D32 = 11.5            # BASELINE.md r1 take-gather microbench
HBM_GBPS_SPEC = 819.0             # v5e public spec
# r4 stride-2 step profile shares (BASELINE.md r4 profile row)
PROFILE_SHARES = {"data_formatting": 0.332, "scatter": 0.277,
                  "loop_fusion": 0.132, "mxu": 0.036, "auc_sort": 0.018}

B, T, N_FAN, M_FAN, D, C_TRAIN, STRIDE = 4096, 9, 10, 10, 32, 2, 2


GATHER_GBPS_BEST = 24.8           # best measured random-row rate (d=128)


def _cost_analysis():
    """Compile both stride branches on the current backend and return their
    XLA cost_analysis dicts."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from score_tpu.config import configs3
    from score_tpu.data import synth
    from score_tpu.data.prep_common import build_dataset
    from score_tpu.graph import device_graph
    from score_tpu.train import (_make_train_step_fn, build_model, init_state,
                                 item_importance_weights)

    user, item, ts = synth.synth_events(50_000, 100_000, 2_000_000,
                                        num_slots=9, seed=0)
    ds = build_dataset(user, item, ts, num_slots=9, user_fanout=N_FAN,
                      item_fanout=M_FAN, num_eval_neg=10, min_user=3,
                      min_item=3, seed=0, dataset_name="roofline")
    cfg = configs3()
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, embed_dim=D, hidden_dim=64,
                                  mlp_dims=(128, 64),
                                  compute_dtype="bfloat16"),
        data=dataclasses.replace(cfg.data, train_neg_mode="inbatch_iw"),
        train=dataclasses.replace(cfg.train, batch_size=B,
                                  table_update_every=STRIDE,
                                  table_lr_boost=2.0))
    graph = device_graph(ds.graph)
    model = build_model(cfg, ds.num_users, ds.num_items)
    rng = jax.random.PRNGKey(0)
    state = init_state(cfg, model, graph, rng)
    neg_iw = jnp.asarray(item_importance_weights(ds.train, ds.num_items))

    batch = {k: jnp.zeros((B,), jnp.int32) for k in ("user", "item", "slot")}
    rows = {}
    for branch in ("full", "dense"):
        step = jax.jit(_make_train_step_fn(model, cfg, with_auc=False,
                                           neg_iw=neg_iw,
                                           force_branch=branch))
        compiled = step.lower(state, graph, batch, rng).compile()
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        rows[branch] = {k: float(ca.get(k, 0.0))
                        for k in ("bytes accessed", "flops",
                                  "transcendentals")}
        print(json.dumps({branch: rows[branch]}), flush=True)
    return rows, jax.default_backend()


def main():
    out_path, reuse = "/tmp/step_roofline.json", None
    for a in sys.argv[1:]:
        if a.startswith("reuse="):
            reuse = a.split("=", 1)[1]
        else:
            out_path = a
    if reuse:
        with open(reuse) as f:
            prior = json.load(f)
        rows, backend = prior["cost_analysis"], prior["backend"] + "(reused)"
    else:
        rows, backend = _cost_analysis()

    # shared shape quantities (see module docstring for the routing):
    #   item table: u_hist B*T*n + cand B*C_eff ; user table: targets B +
    #   i_hist B*C_eff*T*m  (inbatch negatives: C_eff = 1 — rolls reuse the
    #   positive's gathered rows on device)
    gather_rows = B * (T * N_FAN) + B * 1 + B + B * (1 * T * M_FAN)
    gather_bytes = gather_rows * D * 4          # f32 tables
    updates = gather_rows                        # every gathered row grads
    bytes_avg = (rows["full"]["bytes accessed"]
                 + rows["dense"]["bytes accessed"]) / 2.0
    flops_avg = (rows["full"]["flops"] + rows["dense"]["flops"]) / 2.0
    t_mxu_ms = flops_avg / 197e12 * 1e3

    # --- NAIVE microbench-composed sum (the methodological result) ---
    naive_gather = gather_bytes / (GATHER_GBPS_D32 * 1e9) * 1e3
    naive_scatter = updates * SCATTER_NS_PER_UPDATE * 1e-6 / STRIDE
    scatter_bytes = updates * D * 4 * 2 / STRIDE
    naive_stream = max(bytes_avg - gather_bytes - scatter_bytes, 0.0) \
        / (HBM_GBPS_SPEC * 1e9) * 1e3
    naive_ms = naive_gather + naive_scatter + naive_stream + t_mxu_ms

    # --- DEFENSIBLE floor (docstring: each term individually justified) ---
    t_scatter_ms = PROFILE_SHARES["scatter"] * STEP_MS_MEASURED
    t_inputs_ms = (B * (3 + 0) * 4) / (HBM_GBPS_SPEC * 1e9) * 1e3
    t_gather_lo = gather_bytes / (HBM_GBPS_SPEC * 1e9) * 1e3   # spec BW
    t_gather_hi = gather_bytes / (GATHER_GBPS_BEST * 1e9) * 1e3  # measured
    floor_lo = t_scatter_ms + t_gather_lo + t_mxu_ms + t_inputs_ms
    floor_hi = t_scatter_ms + t_gather_hi + t_mxu_ms + t_inputs_ms
    pct_lo = floor_lo / STEP_MS_MEASURED
    pct_hi = floor_hi / STEP_MS_MEASURED

    result = dict(
        cost_analysis=rows,
        naive_microbench_compose_ms=dict(
            gather=round(naive_gather, 3), scatter=round(naive_scatter, 3),
            stream=round(naive_stream, 3), mxu=round(t_mxu_ms, 3),
            total=round(naive_ms, 3),
            overshoot_x=round(naive_ms / STEP_MS_MEASURED, 2),
            finding=("the microbench-composed 'floor' OVERSHOOTS the "
                     "measured step: isolated rates do not compose — "
                     "in-graph gathers beat the standalone gather loop, "
                     "the in-step scatter beats the 19 ns/update "
                     "microbench via duplicate-id coalescing, and XLA "
                     "'bytes accessed' counts fusion-operand bytes, not "
                     "unique HBM traffic")),
        floor_components_ms=dict(
            scatter_r4_measured_at_issue_floor=round(t_scatter_ms, 3),
            gather_unique_rows=[round(t_gather_lo, 3),
                                round(t_gather_hi, 3)],
            mxu=round(t_mxu_ms, 3), inputs=round(t_inputs_ms, 4)),
        composed_floor_ms=[round(floor_lo, 3), round(floor_hi, 3)],
        measured_step_ms=STEP_MS_MEASURED,
        pct_of_speed_of_light=[round(pct_lo, 4), round(pct_hi, 4)],
        gap_ms=[round(STEP_MS_MEASURED - floor_hi, 3),
                round(STEP_MS_MEASURED - floor_lo, 3)],
        gap_attribution_from_r4_profile={
            k: round(v * STEP_MS_MEASURED, 2)
            for k, v in PROFILE_SHARES.items()},
        assumptions=dict(
            scatter_ns_per_update=SCATTER_NS_PER_UPDATE,
            gather_gbps=[HBM_GBPS_SPEC, GATHER_GBPS_BEST],
            hbm_gbps_spec=HBM_GBPS_SPEC,
            gather_rows=gather_rows,
            note=("defensible floor: scatter at its r4-profiled in-step "
                  "time (pinned at the issue-bound floor by the r3/r4 "
                  "dedup/sorted/accumulation probes), unique table-row "
                  "reads at [spec BW .. best measured random-row rate], "
                  "FLOPs at bf16 peak, batch feed at spec BW; all "
                  "[B,T,n,d] intermediates are charged zero (they fit "
                  "VMEM in a perfectly fused program)")),
        backend=backend)
    print(json.dumps(result, indent=2))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
