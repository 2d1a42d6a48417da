"""K-step summed table-grad accumulation probe (VERDICT.md r3 #3).

The faithful "tables updated every K steps with SUMMED grads" scheme must
buffer each step's per-example grad rows and scatter K steps' worth at
once (scattering per step is exactly the baseline). Whether that can win
reduces to one question: does ONE scatter of K*N updates cost less than K
scatters of N updates? The r2/r3 roofline says no — scatter is per-update
issue-bound (~13-19 ns/update, flat in dtype and width) — so the summed
variant can at best break even, minus the accumulation buffer traffic.
This script pins that with numbers at the real step shape (368k zipf ids
-> 90.5k x 32 f32: the item-table grad of the shipped bench step).

The stride-K variant (TrainConfig.table_update_every) is the one that CAN
win: it skips (K-1)/K of the scatters outright; its quality gate is
scripts/table_stride_ablation.py.

Every timing ends with a host readback (relay caveat, BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_scatter(ids, vals, n_rows, d, iters=20):
    """Device-looped timing (the repo's microbench method): the iteration
    loop is a lax.fori_loop INSIDE one jit dispatch, each iteration's ids
    data-depend on the carry (a 368k int add, ~1.4 MB — negligible next to
    the 47 MB scatter), and the returned carry data-depends on every
    iteration's scatter output. One dispatch + one readback: the ~25 ms
    per-call relay RTT (CLAUDE.md) is paid once for the whole loop, not per
    sample (a per-call readback loop here measures mostly RTT)."""
    import jax
    import jax.numpy as jnp

    def run(ids_, vals_, n):
        def body(i, c):
            idx = ids_ + (c * 0).astype(ids_.dtype)
            out = jnp.zeros((n_rows, d), jnp.float32).at[idx].add(vals_)
            return c + out[0, 0].astype(jnp.int32) * 0 + 1
        return jax.lax.fori_loop(0, n, body, jnp.int32(0))

    f = jax.jit(run, static_argnums=2)
    int(f(ids, vals, 2))                      # compile + completion
    t0 = time.time()
    int(f(ids, vals, iters))                  # carry readback = honest wall
    return (time.time() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    d = 32
    n_ids, n_rows = 368_640, 90_560
    rng = np.random.default_rng(0)
    results = {}

    def make(n):
        ids = jnp.asarray((rng.zipf(1.3, size=n) % n_rows).astype(np.int32))
        vals = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
        return ids, vals

    ids, vals = make(n_ids)
    base_ms = bench_scatter(ids, vals, n_rows, d)
    results["per_step_scatter_ms"] = round(base_ms, 2)
    print(json.dumps({"per_step_scatter_ms": results
                      ["per_step_scatter_ms"], "n_ids": n_ids}), flush=True)

    for K in (2, 4):
        ids_k, vals_k = make(K * n_ids)
        ms = bench_scatter(ids_k, vals_k, n_rows, d, iters=10)
        row = dict(K=K, accum_scatter_ms=round(ms, 2),
                   amortized_per_step_ms=round(ms / K, 2),
                   vs_per_step=round(ms / K / base_ms, 3))
        results[f"accum_K{K}"] = row
        print(json.dumps(row), flush=True)

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/accum_scatter.json"
    with open(out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
