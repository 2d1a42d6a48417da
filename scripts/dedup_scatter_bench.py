"""Dedup-scatter microbenchmark (round 3): can sort + permute + segment-sum
+ unique-row scatter beat XLA's direct duplicate-heavy scatter-add?

Context (BASELINE.md r2 scatter roofline): direct scatter is ~19 ns/update,
flat in dtype/width — issue-bound. The r2 'sorted alternatives lose' result
permuted VALUES at ~11 ns/row; but the r3 xprof profile shows XLA's own
row GATHER moving 368k x 32 rows in 0.63 ms (~1.7 ns/row), contradicting
that — so the sorted pipeline deserves a re-measure in the exact train-step
shape:

  ids:   368,640 zipf int32 into a 90,560-row table  (u_hist grads)
  grads: [368640, 32] f32

Pipeline B (dedup): sort_key_val(ids, iota) -> grads[order] (gather)
  -> cumsum over sorted rows -> segment boundaries -> per-unique sums
  (prefix differences) -> scatter-add of ~n_unique rows.

Usage: python scripts/dedup_scatter_bench.py [n_ids] [table_rows] [d]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 368_640
    V = int(sys.argv[2]) if len(sys.argv) > 2 else 90_560
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    # zipf-like ids (duplicate-heavy, like item histories)
    w = np.arange(1, V, dtype=np.float64) ** -0.9
    cdf = np.cumsum(w / w.sum())
    ids_h = np.searchsorted(cdf, rng.random(n)).astype(np.int32)
    uniq = np.unique(ids_h).size
    grads_h = rng.normal(size=(n, d)).astype(np.float32)
    ids = jnp.asarray(ids_h)
    grads = jnp.asarray(grads_h)

    @jax.jit
    def direct(ids, grads):
        return jnp.zeros((V, d), jnp.float32).at[ids].add(grads)

    U = min(n, V)  # unique ids can never exceed the table size: the final
    #                scatter is statically U-sized, not n-sized — THIS is
    #                where the issue-bound update count drops

    @jax.jit
    def dedup(ids, grads):
        sorted_ids, order = lax.sort_key_val(ids, jnp.arange(n, dtype=jnp.int32))
        sg = jnp.take(grads, order, axis=0)              # permute-gather
        prefix = jnp.cumsum(sg, axis=0)                  # [n, d]
        # segment ends: position i is the last of its run
        is_end = jnp.concatenate(
            [sorted_ids[1:] != sorted_ids[:-1], jnp.ones((1,), bool)])
        # positions of segment ends, capped at U (static)
        end_pos = jnp.nonzero(is_end, size=U, fill_value=n - 1)[0]   # [U]
        seg_sum = jnp.take(prefix, end_pos, axis=0)
        seg_sum = seg_sum.at[1:].add(-jnp.take(prefix, end_pos[:-1], axis=0))
        seg_ids = jnp.take(sorted_ids, end_pos)
        n_u = jnp.sum(is_end)
        valid = jnp.arange(U) < n_u
        seg_ids = jnp.where(valid, seg_ids, V)           # OOB rows dropped
        return jnp.zeros((V, d), jnp.float32).at[seg_ids].add(
            seg_sum * valid[:, None],
            mode="drop")

    def timed(f, iters=20):
        out = f(ids, grads)
        float(out[0, 0])                                 # compile + readback
        t0 = time.time()
        for _ in range(iters):
            out = f(ids, grads)
        float(out[0, 0])                                 # honest completion
        return (time.time() - t0) / iters * 1e3

    a = np.asarray(direct(ids, grads))
    b = np.asarray(dedup(ids, grads))
    err = float(np.max(np.abs(a - b)) / max(np.max(np.abs(a)), 1e-9))
    ms_direct = timed(direct)
    ms_dedup = timed(dedup)
    print(json.dumps(dict(
        n_ids=n, table_rows=V, d=d, n_unique=int(uniq),
        direct_ms=round(ms_direct, 3), dedup_ms=round(ms_dedup, 3),
        speedup=round(ms_direct / ms_dedup, 2), rel_err=err)))


if __name__ == "__main__":
    main()
