"""configs4 communication model (VERDICT.md r3 #4): pin bytes-exchanged-
per-step for the a2a train step as a function of (B, T, n+m, capacity,
mesh), validated against the compiled HLO, and derive a predicted ICI-bound
parallel efficiency for a real v5e slice.

What runs here is harness-grade: the fake 8-device CPU mesh compiles the
REAL sharded program (SPMD-partitioned, per-device HLO), so the collective
buffer sizes are exactly what a v5e slice would move; only the TIME numbers
are a model (stated assumptions below), because this sandbox has one chip
(SURVEY.md §7.0).

Method:
  1. compile the full configs4 train step (a2a lookups, inbatch_iw
     negatives — the bench step) on the 8-device mesh at two batch sizes;
  2. parse per-device collective RESULT bytes from the compiled HLO by op
     kind (all-to-all / all-reduce / all-gather / reduce-scatter /
     collective-permute);
  3. check the analytic formula below against the HLO count and check
     linearity in B;
  4. scale to the pinned bench shape (B=4096, step 23.8 ms single-chip,
     BASELINE.md r3) and predict efficiency under stated ICI bandwidths.

Analytic model (per device per step, a2a_lookup in sharding.py):
  Each lookup of L ids exchanges, over the 'rows' axis (R shards):
    ids      s32 [R, cap_p]          (request all_to_all)
    fwd emb  f32 [R, cap_p, d]       (response all_to_all)
    bwd emb  f32 [R, cap_p, d]       (grad-return all_to_all, transpose)
  with cap_p = roundup(ceil(L / mesh_size), R) when capacity=0.
  The train step makes 4 lookups: targets u [B], candidates [B, C],
  u_hist [B, T, n], i_hist [B, C, T, m] (C = 1 in inbatch mode).
  Dense-tower grads all-reduce over 'data' adds a B-independent
  ~4 * n_dense_params bytes.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/comm_model.py --cpu [out_json]
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, ".")

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

# pinned single-chip quantities (BASELINE.md r3 profile, bench B=4096)
PINNED_B = 4096
PINNED_STEP_MS = 23.8
# ICI assumptions for v5e (public spec: 1600 Gbit/s inter-chip bandwidth
# per chip across 4 links of a 2D torus; per-link one-way 400 Gbit/s = 50
# GB/s). The all-to-all is the dominant pattern; we bound with aggregate
# and single-link-bottleneck rates.
ICI_GBPS = {"aggregate_200GBps": 200e9, "single_link_50GBps": 50e9}

_DTYPE_BYTES = {"f64": 8, "s64": 8, "u64": 8, "f32": 4, "s32": 4, "u32": 4,
                "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
                "s8": 1, "u8": 1, "pred": 1}

_COLLECTIVES = ("all-to-all", "all-reduce", "all-gather", "reduce-scatter",
                "collective-permute")


def _shape_bytes(tok: str) -> int:
    m = re.match(r"(\w+)\[([\d,]*)\]", tok)
    if not m or m.group(1) not in _DTYPE_BYTES:
        return 0
    dims = [int(x) for x in m.group(2).split(",") if x] or [1]
    return _DTYPE_BYTES[m.group(1)] * int(np.prod(dims))


def collective_bytes(hlo: str) -> dict:
    """Per-device RESULT bytes (== bytes received per device) by op kind."""
    out = {k: 0 for k in _COLLECTIVES}
    for line in hlo.splitlines():
        for kind in _COLLECTIVES:
            if f" {kind}(" not in line and f" {kind}-start(" not in line:
                continue
            # result type is everything between '=' and the op name
            lhs = line.split("=", 1)
            if len(lhs) != 2:
                continue
            result = lhs[1].split(f" {kind}")[0]
            out[kind] += sum(_shape_bytes(t)
                             for t in re.findall(r"\w+\[[\d,]*\]", result))
            break
    return out


def analytic_a2a_bytes(B: int, C: int, T: int, n: int, m: int, d: int,
                       mesh_size: int, n_rows: int,
                       capacity: int = 0) -> int:
    """Per-device all-to-all bytes/step of the 4 lookups (model above)."""
    total = 0
    for L in (B, B * C, B * T * n, B * C * T * m):
        # batch axis padded to split over all devices, then per-device count
        local = -(-L // mesh_size)
        cap = min(capacity, local) if capacity else local
        cap_p = -(-cap // n_rows) * n_rows
        ids = 4 * n_rows * cap_p
        emb = 4 * n_rows * cap_p * d
        total += ids + 2 * emb        # request + fwd response + bwd return
    return total


def compile_step(B: int, capacity: int = 0):
    """Compile the full configs4 bench train step on the fake 8-device mesh;
    returns the jax Compiled object (per-device SPMD HLO via .as_text()).
    Shared by the byte model below and scripts/overlap_check.py."""
    from score_tpu.config import configs4
    from score_tpu.data import synth
    from score_tpu.data.prep_common import build_dataset
    from score_tpu.graph import device_graph
    from score_tpu.sharding import (batch_sharding, make_lookup_fn,
                                    make_mesh, shard_graph, shard_state)
    from score_tpu.train import build_model, init_state, make_train_step

    devs = jax.devices()
    assert len(devs) >= 8, "run with xla_force_host_platform_device_count=8"
    mesh = make_mesh(devs[:8])
    user, item, ts = synth.synth_events(2000, 4000, 120_000, num_slots=9,
                                        seed=0)
    ds = build_dataset(user, item, ts, num_slots=9, user_fanout=10,
                      item_fanout=10, num_eval_neg=10, min_user=3,
                      min_item=3, seed=0)
    cfg = configs4(num_data=2, num_rows=4)
    # the bench step: bf16 compute, inbatch_iw negatives, d=32 h=64
    import dataclasses
    cfg = cfg.replace(
        model=dataclasses.replace(cfg.model, embed_dim=32, hidden_dim=64,
                                  mlp_dims=(128, 64),
                                  compute_dtype="bfloat16"),
        data=dataclasses.replace(cfg.data, train_neg_mode="inbatch_iw"),
        sharding=dataclasses.replace(cfg.sharding, a2a_capacity=capacity))
    graph = device_graph(ds.graph)
    lookup = make_lookup_fn(mesh, "a2a", capacity=capacity)
    model = build_model(cfg, ds.num_users, ds.num_items, lookup_fn=lookup)
    state = init_state(cfg, model, graph, jax.random.PRNGKey(0))
    state = shard_state(mesh, state)
    graph = shard_graph(mesh, graph)
    bs = batch_sharding(mesh)
    from score_tpu.train import item_importance_weights
    neg_iw = jnp.asarray(item_importance_weights(ds.train, ds.num_items))
    step = make_train_step(model, cfg, neg_iw=neg_iw)
    batch = {k: jax.device_put(
        jnp.asarray(getattr(ds.train, k)[:B] if len(ds.train) >= B
                    else np.resize(getattr(ds.train, k), B)), bs)
        for k in ("user", "item", "slot")}
    lowered = step.lower(state, graph, batch, jax.random.PRNGKey(0))
    return lowered.compile(), cfg


def compile_step_bytes(B: int, capacity: int = 0):
    compiled, cfg = compile_step(B, capacity)
    hlo = compiled.as_text()
    got = collective_bytes(hlo)
    hbm = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        hbm = float(ca.get("bytes accessed", 0.0))
    except Exception:
        pass
    # effective candidate count: under the sharded lookup the in-batch
    # negatives roll IDS pre-exchange (model.py id-roll path), so the cand
    # and i_hist lookups run at C = 1 + num_train_neg
    shapes = dict(B=B, C=1 + cfg.data.num_train_neg, T=9, n=10, m=10,
                  d=cfg.model.embed_dim, mesh=[2, 4], capacity=capacity)
    return shapes, got, hbm


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/comm_model.json"
    rows = []
    for B in (512, 1024):
        shapes, got, hbm = compile_step_bytes(B)
        pred = analytic_a2a_bytes(
            shapes["B"], shapes["C"], shapes["T"], shapes["n"], shapes["m"],
            shapes["d"], 8, 4, shapes["capacity"])
        rows.append(dict(shapes=shapes, hlo_collective_bytes=got,
                         analytic_a2a_bytes=pred,
                         hbm_bytes_per_device=hbm))
        print(json.dumps(rows[-1]), flush=True)

    # linearity in B + analytic-vs-HLO agreement
    a2a0, a2a1 = (r["hlo_collective_bytes"]["all-to-all"] for r in rows)
    lin = a2a1 / max(a2a0, 1)
    agree = [r["hlo_collective_bytes"]["all-to-all"] /
             max(r["analytic_a2a_bytes"], 1) for r in rows]

    # Per-op linear fit bytes(B) = a + b*B from the two compiled points,
    # extrapolated to the pinned bench batch. This captures EVERYTHING the
    # compiled program moves, not just the deduped a2a exchange. Historical
    # note: the pre-id-roll program's dominant collective was full-tensor
    # all-gathers of the rolled EMBEDDED item side (143 MB/device/step at
    # B=4096); rolling the int32 IDS before the exchange (model.py id-roll
    # path, VERDICT.md r3→r4) collapsed all-gather to ~1.7 MB and left the
    # a2a lookups (C_eff=2) as the dominant term — 149.4 MB/device/step
    # total (COMM_MODEL_r4.json).
    B0, B1 = (r["shapes"]["B"] for r in rows)
    bench_by_kind = {}
    for kind in _COLLECTIVES:
        y0 = rows[0]["hlo_collective_bytes"][kind]
        y1 = rows[1]["hlo_collective_bytes"][kind]
        slope = (y1 - y0) / (B1 - B0)
        intercept = y0 - slope * B0
        bench_by_kind[kind] = int(max(intercept + slope * PINNED_B, 0))
    bench_bytes = sum(bench_by_kind.values())
    bench_a2a = analytic_a2a_bytes(PINNED_B, rows[0]["shapes"]["C"], 9, 10,
                                   10, 32, 8, 4, 0)
    pred = {}
    for name, bw in ICI_GBPS.items():
        t_comm_ms = bench_bytes / bw * 1e3
        # no-overlap lower bound; dataflow independence lets XLA overlap the
        # four exchanges with co-attention compute, so the true number sits
        # between eff_no_overlap and ~1.0 (sharding.py overlap note)
        eff = PINNED_STEP_MS / (PINNED_STEP_MS + t_comm_ms)
        pred[name] = dict(t_comm_ms=round(t_comm_ms, 3),
                          efficiency_no_overlap=round(eff, 4))
    result = dict(
        rows=rows,
        linearity_B_ratio=round(lin, 3),
        hlo_over_analytic_a2a=[round(a, 3) for a in agree],
        bench_shape=dict(B=PINNED_B, T=9, n=10, m=10, d=32,
                         mesh=[2, 4], capacity=0,
                         single_chip_step_ms=PINNED_STEP_MS),
        bench_bytes_by_kind=bench_by_kind,
        bench_total_collective_bytes_per_device=bench_bytes,
        analytic_a2a_bytes_at_bench=bench_a2a,
        predicted_v5e=pred,
        backend=jax.default_backend(),
    )
    print(json.dumps(result["predicted_v5e"]))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
