"""Scatter-add strategy micro-benchmark (the dominant step cost: the two
embedding-grad scatters are ~41% of the profiled bf16 train step).

Measures, at the real step's shapes (737k ids -> 50k-row user table / 368k
ids -> 91k-row item table, d=32 f32, zipf-ish duplication):

  xla_scatter      zeros.at[ids].add(vals)            (the current lowering)
  sort_only        lax.sort_key_val(ids, iota)        (cost isolation)
  perm_gather      take(vals, perm)                   (cost isolation)
  sorted_scatter   sort + perm-gather + scatter       (does sortedness help?)
  sorted_segsum    sort + perm-gather + segment_sum(indices_are_sorted=True)
  unsorted_segsum  segment_sum directly

Every timing ends with a host readback (relay caveat, BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(fn, args, iters=20):
    import jax
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0][:1])     # compile
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0][:1])  # honest readback
    return (time.time() - t0) / iters * 1000


def main():
    import jax
    import jax.numpy as jnp

    d = 32
    rng = np.random.default_rng(0)
    for n_ids, n_rows, tag in ((737_280, 50_048, "user-table"),
                               (368_640, 90_560, "item-table")):
        # zipf-ish duplication like real neighbor ids
        ids_np = (rng.zipf(1.3, size=n_ids) % n_rows).astype(np.int32)
        ids = jnp.asarray(ids_np)
        vals = jnp.asarray(rng.normal(size=(n_ids, d)).astype(np.float32))
        iota = jnp.arange(n_ids, dtype=jnp.int32)

        xla_scatter = jax.jit(lambda i, v: jnp.zeros(
            (n_rows, d), jnp.float32).at[i].add(v))
        sort_only = jax.jit(lambda i: jax.lax.sort_key_val(i, iota))
        perm = jax.jit(lambda i: jax.lax.sort_key_val(i, iota)[1])(ids)
        perm = jax.block_until_ready(perm)
        perm_gather = jax.jit(lambda p, v: jnp.take(v, p, axis=0))

        def sorted_scatter(i, v):
            si, p = jax.lax.sort_key_val(i, iota)
            sv = jnp.take(v, p, axis=0)
            return jnp.zeros((n_rows, d), jnp.float32).at[si].add(
                sv, indices_are_sorted=True)

        def sorted_segsum(i, v):
            si, p = jax.lax.sort_key_val(i, iota)
            sv = jnp.take(v, p, axis=0)
            return jax.ops.segment_sum(sv, si, num_segments=n_rows,
                                       indices_are_sorted=True)

        unsorted_segsum = jax.jit(lambda i, v: jax.ops.segment_sum(
            v, i, num_segments=n_rows))

        vals16 = vals.astype(jnp.bfloat16)
        vals_d8 = vals[:, :8]
        xla_scatter16 = jax.jit(lambda i, v: jnp.zeros(
            (n_rows, d), jnp.bfloat16).at[i].add(v))
        xla_scatter_d8 = jax.jit(lambda i, v: jnp.zeros(
            (n_rows, 8), jnp.float32).at[i].add(v))
        res = dict(tag=tag, n_ids=n_ids, n_rows=n_rows,
                   xla_scatter_ms=bench(xla_scatter, (ids, vals)),
                   xla_scatter_bf16_ms=bench(xla_scatter16, (ids, vals16)),
                   xla_scatter_d8_ms=bench(xla_scatter_d8, (ids, vals_d8)),
                   sort_only_ms=bench(sort_only, (ids,)),
                   perm_gather_ms=bench(perm_gather, (perm, vals)),
                   perm_gather_bf16_ms=bench(perm_gather, (perm, vals16)),
                   sorted_scatter_ms=bench(jax.jit(sorted_scatter),
                                           (ids, vals)),
                   sorted_segsum_ms=bench(jax.jit(sorted_segsum),
                                          (ids, vals)),
                   unsorted_segsum_ms=bench(unsorted_segsum, (ids, vals)))
        print(json.dumps({k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in res.items()}), flush=True)


if __name__ == "__main__":
    main()
