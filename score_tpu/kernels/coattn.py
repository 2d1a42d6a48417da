"""Pallas fused cross-neighbor co-attention (SURVEY.md §2.3 #8, M4).

One kernel fuses the whole per-slot block — bilinear relation matrix
M = Eu Wr Ei^T, dual masked softmax, target-aware terms, weighted sums —
so the [G, n, m] relation tensor and both attention maps never round-trip
through HBM (the jnp reference path materializes them between XLA fusions).

Grid: the (B, T) problem is flattened to G = B*T independent rows and tiled
by TILE_G; every tensor op batches over the tile so the small per-slot
matmuls (n, m <= ~32, d <= ~64) still feed the MXU as [TILE_G*n, d]-shaped
contractions.

Equivalence contract: bit-level-close (f32) to
score_tpu.nn.coattn.cross_coattn_ref — gated by tests/test_kernels.py.
Backward: custom_vjp recomputes through the jnp reference (forward-fused,
backward XLA); a fused backward kernel is a later optimization.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..nn.coattn import cross_coattn_ref

_NEG = -1e9


def _coattn_kernel(Eu_ref, Ei_ref, mu_ref, mi_ref, eu_ref, ei_ref, Wr_ref,
                   cu_ref, ci_ref, *, pool: str, target_aware: bool):
    # Block shapes: Eu [G, n, d], Ei [G, m, d], mu [G, n] f32, mi [G, m] f32,
    # eu/ei [G, d], Wr [d, d]; outputs cu/ci [G, d].
    Eu = Eu_ref[:]
    Ei = Ei_ref[:]
    mu = mu_ref[:]
    mi = mi_ref[:]
    G, n, d = Eu.shape
    m = Ei.shape[1]
    scale = jax.lax.rsqrt(jnp.asarray(float(d), jnp.float32))

    # EuW as one [G*n, d] x [d, d] MXU matmul.
    EuW = jnp.dot(Eu.reshape(G * n, d), Wr_ref[:],
                  preferred_element_type=jnp.float32).reshape(G, n, d)

    if pool == "sum":
        # Sum-pool identity (see nn/coattn.py): pooled scores via masked
        # opposite-side sums — no [G, n, m] relation tensor, no batched
        # tiny matmuls.
        Ei_sum = jnp.sum(Ei * mi[:, :, None], axis=1)    # [G, d]
        EuW_sum = jnp.sum(EuW * mu[:, :, None], axis=1)  # [G, d]
        su = jnp.sum(EuW * Ei_sum[:, None, :], axis=2) * scale   # [G, n]
        si = jnp.sum(Ei * EuW_sum[:, None, :], axis=2) * scale   # [G, m]
    else:  # max
        M = jax.lax.dot_general(
            EuW, Ei, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [G, n, m]
        pair = mu[:, :, None] * mi[:, None, :]           # [G, n, m] 0/1
        Mm = jnp.where(pair > 0, M, _NEG)
        su = jnp.max(Mm, axis=2)
        si = jnp.max(Mm, axis=1)
        any_mi = jnp.max(mi, axis=1, keepdims=True)      # [G, 1]
        any_mu = jnp.max(mu, axis=1, keepdims=True)
        su = jnp.where(any_mi > 0, su, 0.0)
        si = jnp.where(any_mu > 0, si, 0.0)

    if target_aware:
        # su += Eu . ei, si += Ei . eu (per-row dot with the target).
        # Multiply-reduce on the VPU: Mosaic's dot lowering rejects batched
        # mat-vecs (empty non-contracting dims), and at d <= 64 these are
        # bandwidth-trivial anyway.
        su = su + jnp.sum(Eu * ei_ref[:][:, None, :], axis=2) * scale
        si = si + jnp.sum(Ei * eu_ref[:][:, None, :], axis=2) * scale

    def _masked_softmax(s, mask):
        s = jnp.where(mask > 0, s, _NEG)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s) * mask
        return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)

    a = _masked_softmax(su, mu)                          # [G, n]
    b = _masked_softmax(si, mi)                          # [G, m]
    # weighted sums as multiply-reduce (batched mat-vec unsupported by the
    # Mosaic dot lowering; n, m are tiny so this is VPU-cheap)
    cu_ref[:] = jnp.sum(a[:, :, None] * Eu, axis=1)      # [G, d]
    ci_ref[:] = jnp.sum(b[:, :, None] * Ei, axis=1)


def _coattn_fwd_pallas(Eu, Ei, mu, mi, Wr, eu, ei, *, pool: str,
                       target_aware: bool, tile_g: int = 64,
                       interpret: bool = False
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, T, n, d = Eu.shape
    m = Ei.shape[2]
    G = B * T
    Gp = -(-G // tile_g) * tile_g

    def flat(x, shape):
        x = x.reshape((G,) + shape)
        if Gp != G:
            x = jnp.pad(x, ((0, Gp - G),) + ((0, 0),) * len(shape))
        return x

    Euf = flat(Eu.astype(jnp.float32), (n, d))
    Eif = flat(Ei.astype(jnp.float32), (m, d))
    muf = flat(mu.astype(jnp.float32), (n,))
    mif = flat(mi.astype(jnp.float32), (m,))
    # broadcast targets over T then flatten to G
    euf = flat(jnp.broadcast_to(eu[:, None, :], (B, T, d)).astype(jnp.float32),
               (d,))
    eif = flat(jnp.broadcast_to(ei[:, None, :], (B, T, d)).astype(jnp.float32),
               (d,))

    grid = (Gp // tile_g,)
    bs = lambda shape: pl.BlockSpec((tile_g,) + shape,
                                    lambda g: (g,) + (0,) * len(shape),
                                    memory_space=pltpu.VMEM)
    cu, ci = pl.pallas_call(
        functools.partial(_coattn_kernel, pool=pool,
                          target_aware=target_aware),
        grid=grid,
        in_specs=[bs((n, d)), bs((m, d)), bs((n,)), bs((m,)),
                  bs((d,)), bs((d,)),
                  pl.BlockSpec((d, d), lambda g: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(bs((d,)), bs((d,))),
        out_shape=(jax.ShapeDtypeStruct((Gp, d), jnp.float32),
                   jax.ShapeDtypeStruct((Gp, d), jnp.float32)),
        interpret=interpret,
    )(Euf, Eif, muf, mif, euf, eif, Wr.astype(jnp.float32))
    cu = cu[:G].reshape(B, T, d).astype(Eu.dtype)
    ci = ci[:G].reshape(B, T, d).astype(Ei.dtype)
    return cu, ci


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def cross_coattn_pallas(Eu, Ei, mu, mi, Wr, eu, ei, pool: str = "sum",
                        target_aware: bool = True, interpret: bool = False):
    """Fused co-attention; forward = Pallas kernel, backward = recompute
    through the jnp reference (identical math)."""
    return _coattn_fwd_pallas(Eu, Ei, mu, mi, Wr, eu, ei, pool=pool,
                              target_aware=target_aware, interpret=interpret)


def _fwd(Eu, Ei, mu, mi, Wr, eu, ei, pool, target_aware, interpret):
    out = _coattn_fwd_pallas(Eu, Ei, mu, mi, Wr, eu, ei, pool=pool,
                             target_aware=target_aware, interpret=interpret)
    return out, (Eu, Ei, mu, mi, Wr, eu, ei)


def _bwd(pool, target_aware, interpret, res, g):
    Eu, Ei, mu, mi, Wr, eu, ei = res
    _, vjp = jax.vjp(
        lambda Eu_, Ei_, Wr_, eu_, ei_: cross_coattn_ref(
            Eu_, Ei_, mu, mi, Wr_, eu_, ei_, pool=pool,
            target_aware=target_aware),
        Eu, Ei, Wr, eu, ei)
    dEu, dEi, dWr, deu, dei = vjp(g)
    return dEu, dEi, None, None, dWr, deu, dei


cross_coattn_pallas.defvjp(_fwd, _bwd)
