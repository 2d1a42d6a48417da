"""Sharded-serving communication model (VERDICT.md r4 #9).

configs4 serving (row-sharded tables + a2a lookups through ScoringService)
has correctness tests but no performance characterization. This reuses the
comm-model method (scripts/comm_model.py: compile the REAL sharded program
on the fake 8-device mesh, parse per-device collective RESULT bytes from
the SPMD HLO) on the exact dispatch `ScoringService.score_batch` issues —
`_score_cand` on a [R, C_bucket] request block — and derives:

  * collective bytes per dispatch and per request (linear fit over R);
  * predicted added latency per dispatch at the stated ICI bandwidths;
  * the predicted sharded-serving envelope next to the measured
    single-chip one (BASELINE.md r4: 0.295 ms/request device cost at
    C=101, 3295 req/s at R=1024).

Only the TIME numbers are a model (stated bandwidths); the bytes are what
the compiled program moves.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/serve_comm_model.py --cpu [out_json]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax

if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import dataclasses

import jax.numpy as jnp
import numpy as np

from comm_model import _COLLECTIVES, collective_bytes

# measured single-chip serving pins (BASELINE.md r4 envelope row)
DEVICE_MS_PER_REQ = 0.295
ICI_GBPS = {"aggregate_200GBps": 200e9, "single_link_50GBps": 50e9}
C_EVAL = 101          # 1 positive + 100 candidates -> bucket 128


def main():
    out_path = (sys.argv[1] if len(sys.argv) > 1
                else "/tmp/serve_comm_model.json")
    from score_tpu.config import configs4
    from score_tpu.data import synth
    from score_tpu.data.prep_common import build_dataset
    from score_tpu.serve import ScoringService, _bucket
    from score_tpu.sharding import make_lookup_fn, make_mesh
    from score_tpu.train import build_model, init_state
    from score_tpu.graph import device_graph

    devs = jax.devices()
    assert len(devs) >= 8, "run with xla_force_host_platform_device_count=8"
    mesh = make_mesh(devs[:8])
    user, item, ts = synth.synth_events(2000, 4000, 120_000, num_slots=9,
                                        seed=0)
    ds = build_dataset(user, item, ts, num_slots=9, user_fanout=10,
                      item_fanout=10, num_eval_neg=10, min_user=3,
                      min_item=3, seed=0)
    cfg = configs4(num_data=2, num_rows=4)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, embed_dim=32, hidden_dim=64, mlp_dims=(128, 64),
        compute_dtype="bfloat16"))
    lookup = make_lookup_fn(mesh, "a2a")
    model = build_model(cfg, ds.num_users, ds.num_items, lookup_fn=lookup)
    graph = device_graph(ds.graph)
    state = init_state(cfg, model, graph, jax.random.PRNGKey(0))
    svc = ScoringService(cfg, ds, state.params, mesh=mesh, lookup_fn=lookup)

    cb = _bucket(C_EVAL)
    rows = []
    for R in (64, 256):
        users = jnp.zeros(R, jnp.int32)
        cand = jnp.zeros((R, cb), jnp.int32)
        slots = jnp.full(R, svc.slot, jnp.int32)
        compiled = svc._score_cand.lower(
            svc.params, svc.graph, users, cand, slots).compile()
        got = collective_bytes(compiled.as_text())
        rows.append(dict(R=R, C_bucket=cb, collective_bytes=got,
                         total=sum(got.values())))
        print(json.dumps(rows[-1]), flush=True)

    # per-request linear fit (slope) + intercept per dispatch
    (r0, y0), (r1, y1) = ((r["R"], r["total"]) for r in rows)
    slope = (y1 - y0) / (r1 - r0)          # bytes/request
    intercept = y0 - slope * r0            # fixed bytes/dispatch
    by_kind = {}
    for kind in _COLLECTIVES:
        k0 = rows[0]["collective_bytes"][kind]
        k1 = rows[1]["collective_bytes"][kind]
        s = (k1 - k0) / (r1 - r0)
        by_kind[kind] = dict(bytes_per_request=int(s),
                             fixed_bytes_per_dispatch=int(k0 - s * r0))
    pred = {}
    for name, bw in ICI_GBPS.items():
        t_req_ms = slope / bw * 1e3
        # no-overlap serial model: device compute + exchange per request
        total_ms = DEVICE_MS_PER_REQ + t_req_ms
        pred[name] = dict(
            comm_ms_per_request=round(t_req_ms, 4),
            predicted_ms_per_request_no_overlap=round(total_ms, 4),
            predicted_req_per_s_R1024_no_overlap=round(1e3 / total_ms, 1),
            efficiency_vs_single_chip=round(
                DEVICE_MS_PER_REQ / total_ms, 4))
    result = dict(
        rows=rows,
        bytes_per_request=int(slope),
        fixed_bytes_per_dispatch=int(intercept),
        by_kind=by_kind,
        single_chip_device_ms_per_request=DEVICE_MS_PER_REQ,
        predicted_v5e=pred,
        note=("serving is forward-only: C_eff = C_bucket for the cand/"
              "i_hist lookups, no grad-return exchange; bytes are per "
              "device from the compiled SPMD HLO (fake 8-dev mesh), times "
              "are modeled at the stated ICI bandwidths. The efficiency "
              "column is the no-overlap bound vs the measured single-chip "
              "0.295 ms/request; sharded serving exists for models whose "
              "tables exceed one chip's HBM, not for latency."),
        backend=jax.default_backend())
    print(json.dumps(result["predicted_v5e"], indent=2))
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
