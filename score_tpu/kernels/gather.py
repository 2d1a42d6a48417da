"""Pallas HBM row-gather for embedding lookups (SURVEY.md §2.1 table, M4).

XLA's native dynamic-gather on TPU moves ~32 GB/s effective for 128-byte
rows (measured in-session, round 1) — far under HBM speed-of-light, and the
embedding lookups are the framework's dominant memory traffic
(B*T*(n+m) row fetches per step). This kernel issues row DMAs directly,
many in flight, from scalar-prefetched indices.

Design: grid over id-tiles. The ids arrive via PrefetchScalarGridSpec (SMEM,
available before the body runs); each program issues TILE_N async copies
HBM->VMEM (one per row, the DMA engine pipelines them) and waits once.

Equivalence-gated vs jnp.take in tests/test_kernels.py; benchmarked with
host-readback timing (block_until_ready lies on this backend).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_INFLIGHT = 256  # sflag memory holds at most 512 DMA semaphores


def _gather_kernel(ids_ref, table_ref, out_ref, sems, *, tile_n: int):
    # ids_ref is this tile's id block in SMEM (whole-array scalar prefetch
    # would overflow the 1 MB SMEM for realistic id counts). Row DMAs run
    # with a rolling window of W outstanding copies: before reusing
    # semaphore slot j % W, wait on the copy that last used it.
    #
    # Wait accounting (each copy's semaphore must be waited exactly once on
    # hardware — a double wait hangs): the issue loop waits copies
    # [0, tile_n - W), the drain loop waits [tile_n - W, tile_n) — disjoint
    # and exhaustive. This bookkeeping requires tile_n >= W, which
    # gather_rows_pallas guarantees statically (tile_n is a multiple of
    # 1024, _INFLIGHT <= 256), asserted here so the ambiguous branch can
    # never silently appear.
    W = _INFLIGHT
    assert tile_n >= W, (tile_n, W)

    def dma(j):
        row = ids_ref[j]
        return pltpu.make_async_copy(
            table_ref.at[row], out_ref.at[j], sems.at[j % W])

    def issue(j, _):
        @pl.when(j >= W)
        def _():
            dma(j - W).wait()
        dma(j).start()
        return 0

    jax.lax.fori_loop(0, tile_n, issue, 0)

    def drain(j, _):
        dma(j).wait()
        return 0

    jax.lax.fori_loop(tile_n - W, tile_n, drain, 0)


def gather_rows_pallas(table: jnp.ndarray, ids: jnp.ndarray,
                       tile_n: int = 1024,
                       interpret: bool = False) -> jnp.ndarray:
    """table: [V, d]; ids: [...] int32 -> [..., d] (== jnp.take(table, ids, 0)).

    Out-of-range ids are the caller's bug (no clamping); pad id 0 is a valid
    row like any other.
    """
    shape = ids.shape
    flat = ids.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        flat = jnp.pad(flat, (0, n_pad - n))
    d = table.shape[1]

    # tile_n must be a multiple of 1024: 1D s32 inputs carry XLA layout
    # T(1024), and Mosaic requires the SMEM block to match it.
    assert tile_n % 1024 == 0, tile_n
    out = pl.pallas_call(
        functools.partial(_gather_kernel, tile_n=tile_n),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n,), lambda g: (g,),
                         memory_space=pltpu.SMEM),         # this tile's ids
            pl.BlockSpec(memory_space=pl.ANY),             # table in HBM
        ],
        out_specs=pl.BlockSpec((tile_n, d), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_INFLIGHT,))],
        out_shape=jax.ShapeDtypeStruct((n_pad, d), table.dtype),
        interpret=interpret,
    )(flat, table)
    return out[:n].reshape(shape + (d,))
