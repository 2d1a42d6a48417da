"""Pallas fused co-attention for the CANDIDATES form (VERDICT.md r4 #1).

The per-pair kernel in kernels/coattn.py needs the tiled [B*C, ...] layout
and lost its train-path A/B twice (BASELINE.md r2) because tiling
materializes C copies of the shared user side. This kernel is written FOR
the form the model actually ships (nn/coattn.py candidates paths): the
user side enters ONCE ([B, T, n, d]), the candidate axis C is internal
(static python loop; C = 1 + negatives = 2 in training), and the whole
block — masked sums, the reassociated bilinear scores, target terms, dual
masked softmaxes, weighted sums — runs in VMEM between one read of Eu/Ei
and one write of cu/ci.

Why this attacks the r4 profile's top cost (33.2% layout-conversion
copies): the copies are XLA's relayout of the [4096, 9, 10, 32] tensors to
batch-minormost between the gather/scatter boundary layouts and the
elementwise fusions' preferred layouts. Fusing the whole block into one
kernel removes those intermediate fusions — the kernel reads the gather's
row-major output directly and its backward emits dEu/dEi in the row-major
layout the table-grad scatter consumes.

Math (the WR_ON_SUMMARY reassociation, nn/coattn.py): with sum pooling,
  EuW_sum = (Σ_n mu·Eu) @ Wr                       [B, T, d]
  su_c    = Eu · (Ei_sum_c @ Wr^T + ei_c) · scale  [B, T, n]
  si_c    = Ei_c · (EuW_sum + eu) · scale          [B, T, m]
  cu_c    = softmax_n(su_c | mu)^T Eu,   ci_c = softmax_m(si_c | mi_c)^T Ei_c
— the [B,T,n,d] EuW intermediate never exists and the target terms fold
into the score dots. pool='sum' + any target_aware; other pools use the
jnp path (they need the relation matrix).

Equivalence contract: tolerance-close to the plain candidates-form
reference below (f32), values AND grads — tests/test_kernels.py. The
backward is a second fused kernel (recomputes the forward in VMEM, fuses
both softmax VJPs and all weighted-sum VJPs, accumulates dWr across the
sequential grid).

RETIRED from the train path (chip A/B, CAND_KERNEL_r5.json): inside the
shipped static stride loop, tile 32 — the largest block that compiles in
the full step graph — measured 158.5k examples/s vs 233.7k for the jnp
path in the same sweep window (-32%); tile 64 compiles standalone (1e74a69
fixes) but crashes the Mosaic compiler when embedded in the step. The
structural loss is tile padding: at (n=10, d=32) every f32 VMEM
intermediate rounds up to (8,128) tiles, ~6.4x the logical bytes, so the
fused kernel moves MORE physical VMEM traffic than the jnp path's
relayout copies cost. This is the second shape-driven retirement of a
co-attention kernel (per-pair form: BASELINE.md r2) and closes VERDICT.md
r4 #1 on the retire branch — with the measurement taken on the RIGHT
(candidates) form this time. The kernel stays, interpret-gated, as the
reference fused implementation.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e9


def cross_coattn_cand_ref(Eu, Ei, mu, mi, Wr, eu, ei,
                          target_aware: bool = True):
    """Plain (non-reassociated) candidates-form reference: the oracle the
    kernel is gated against. Eu [B,T,n,d], Ei [B,C,T,m,d], mu [B,T,n],
    mi [B,C,T,m], Wr [d,d], eu [B,d], ei [B,C,d] -> cu, ci [B,C,T,d]."""
    d = Eu.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, jnp.float32))
    Eu = Eu.astype(jnp.float32)
    Ei = Ei.astype(jnp.float32)
    muf = mu.astype(jnp.float32)
    mif = mi.astype(jnp.float32)
    EuW = jnp.einsum("btnd,de->btne", Eu, Wr.astype(jnp.float32))
    EuW_sum = jnp.sum(EuW * muf[..., None], axis=2)             # [B,T,d]
    Ei_sum = jnp.sum(Ei * mif[..., None], axis=3)               # [B,C,T,d]
    su = jnp.einsum("btnd,bctd->bctn", EuW, Ei_sum) * scale
    si = jnp.einsum("bctmd,btd->bctm", Ei, EuW_sum) * scale
    if target_aware:
        su = su + jnp.einsum("btnd,bcd->bctn", Eu,
                             ei.astype(jnp.float32)) * scale
        si = si + jnp.einsum("bctmd,bd->bctm", Ei,
                             eu.astype(jnp.float32)) * scale

    def smax(s, mask):
        s = jnp.where(mask > 0, s, _NEG)
        s = s - jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s) * mask
        return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)

    a = smax(su, muf[:, None])
    b = smax(si, mif)
    cu = jnp.einsum("bctn,btnd->bctd", a, Eu)
    ci = jnp.einsum("bctm,bctmd->bctd", b, Ei)
    return cu, ci


def _sum_t(x):
    """[BT, T, d] -> [BT, d]: jnp.sum(axis=1) over the middle axis of a
    rank-3 VMEM value crashes the Mosaic compiler on this toolchain
    (bisected in round 5); unrolled slice-adds lower cleanly. T is 9."""
    s = x[:, 0]
    for t in range(1, x.shape[1]):
        s = s + x[:, t]
    return s


def _smax(s, mask):
    s = jnp.where(mask > 0, s, _NEG)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s) * mask
    return e / jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)


def _fwd_common(Eu_ref, Ei_ref, mu_ref, mi_ref, Wr_ref, eu_ref, ei_ref,
                *, target_aware: bool):
    """Shared forward math on one [BT]-block; returns per-candidate lists
    (a, b, v, Ei_sum) plus (Eu32, EuW_sum, w) for reuse by the backward."""
    Eu = Eu_ref[:].astype(jnp.float32)              # [BT, T, n, d]
    mu = mu_ref[:]                                  # [BT, T, n] f32
    Wr = Wr_ref[:]                                  # [d, d] f32
    BT, T, n, d = Eu.shape
    C = ei_ref.shape[1]
    scale = jax.lax.rsqrt(jnp.asarray(float(d), jnp.float32))

    Eu_msum = jnp.sum(Eu * mu[..., None], axis=2)   # [BT, T, d]
    EuW_sum = jnp.dot(Eu_msum.reshape(BT * T, d), Wr,
                      preferred_element_type=jnp.float32).reshape(BT, T, d)
    w = EuW_sum
    if target_aware:
        w = w + eu_ref[:].astype(jnp.float32)[:, None, :]

    a_l, b_l, v_l, es_l = [], [], [], []
    for c in range(C):
        Ei_c = Ei_ref[:, c].astype(jnp.float32)     # [BT, T, m, d]
        mi_c = mi_ref[:, c]                         # [BT, T, m] f32
        Ei_sum = jnp.sum(Ei_c * mi_c[..., None], axis=2)      # [BT, T, d]
        v = jnp.dot(Ei_sum.reshape(BT * T, d), Wr.T,
                    preferred_element_type=jnp.float32).reshape(BT, T, d)
        if target_aware:
            v = v + ei_ref[:, c].astype(jnp.float32)[:, None, :]
        su = jnp.sum(Eu * v[:, :, None, :], axis=3) * scale   # [BT, T, n]
        si = jnp.sum(Ei_c * w[:, :, None, :], axis=3) * scale  # [BT, T, m]
        a = _smax(su, mu)
        b = _smax(si, mi_c)
        a_l.append(a)
        b_l.append(b)
        v_l.append(v)
        es_l.append(Ei_sum)
    return Eu, EuW_sum, w, a_l, b_l, v_l, es_l, scale


def _cand_fwd_kernel(Eu_ref, Ei_ref, mu_ref, mi_ref, Wr_ref, eu_ref, ei_ref,
                     cu_ref, ci_ref, *, target_aware: bool):
    Eu, _, _, a_l, b_l, _, _, _ = _fwd_common(
        Eu_ref, Ei_ref, mu_ref, mi_ref, Wr_ref, eu_ref, ei_ref,
        target_aware=target_aware)
    C = ei_ref.shape[1]
    out_dt = cu_ref.dtype
    for c in range(C):
        Ei_c = Ei_ref[:, c].astype(jnp.float32)
        cu_ref[:, c] = jnp.sum(a_l[c][..., None] * Eu, axis=2).astype(out_dt)
        ci_ref[:, c] = jnp.sum(b_l[c][..., None] * Ei_c,
                               axis=2).astype(out_dt)


def _cand_bwd_kernel(Eu_ref, Ei_ref, mu_ref, mi_ref, Wr_ref, eu_ref, ei_ref,
                     dcu_ref, dci_ref,
                     dEu_ref, dEi_ref, deu_ref, dei_ref, dWr_ref,
                     *, target_aware: bool):
    """Fused backward: forward recompute in VMEM, softmax + weighted-sum
    VJPs fused, dWr accumulated across the sequential grid."""
    Eu, EuW_sum, w, a_l, b_l, v_l, es_l, scale = _fwd_common(
        Eu_ref, Ei_ref, mu_ref, mi_ref, Wr_ref, eu_ref, ei_ref,
        target_aware=target_aware)
    mu = mu_ref[:]
    Wr = Wr_ref[:]
    BT, T, n, d = Eu.shape
    C = ei_ref.shape[1]

    dEu = jnp.zeros((BT, T, n, d), jnp.float32)
    dw = jnp.zeros((BT, T, d), jnp.float32)
    dWr = jnp.zeros((d, d), jnp.float32)
    for c in range(C):
        Ei_c = Ei_ref[:, c].astype(jnp.float32)
        mi_c = mi_ref[:, c]
        a, b, v, Ei_sum = a_l[c], b_l[c], v_l[c], es_l[c]
        dcu = dcu_ref[:, c].astype(jnp.float32)     # [BT, T, d]
        dci = dci_ref[:, c].astype(jnp.float32)

        # cu = Σ_n a·Eu ; ci = Σ_m b·Ei
        da = jnp.sum(Eu * dcu[:, :, None, :], axis=3)          # [BT, T, n]
        db = jnp.sum(Ei_c * dci[:, :, None, :], axis=3)        # [BT, T, m]
        dEu = dEu + a[..., None] * dcu[:, :, None, :]
        dEi_c = b[..., None] * dci[:, :, None, :]
        # softmax VJP (masked rows have a == 0 -> ds == 0)
        dsu = a * (da - jnp.sum(a * da, axis=-1, keepdims=True))
        dsi = b * (db - jnp.sum(b * db, axis=-1, keepdims=True))
        # su = Σ_d Eu·v·scale ; si = Σ_d Ei·w·scale
        dEu = dEu + scale * dsu[..., None] * v[:, :, None, :]
        dv = scale * jnp.sum(dsu[..., None] * Eu, axis=2)      # [BT, T, d]
        dEi_c = dEi_c + scale * dsi[..., None] * w[:, :, None, :]
        dw = dw + scale * jnp.sum(dsi[..., None] * Ei_c, axis=2)
        # v = Ei_sum @ Wr^T (+ ei_c)
        if target_aware:
            # dei is candidate-major [C, BT, d]: a [:, c] write into a
            # [BT, C, d] ref (middle dim 2, bf16 tiling) crashes the
            # Mosaic compiler; a leading-index write is the supported form
            dei_ref[c] = _sum_t(dv).astype(dei_ref.dtype)
        # contract the big axis without materializing a transpose (a
        # [BT*T, d].T relayout crashed the Mosaic compile)
        dWr = dWr + jax.lax.dot_general(
            dv.reshape(BT * T, d), Ei_sum.reshape(BT * T, d),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dEi_sum = jnp.dot(dv.reshape(BT * T, d), Wr,
                          preferred_element_type=jnp.float32
                          ).reshape(BT, T, d)
        # Ei_sum = Σ_m mi·Ei
        dEi_c = dEi_c + mi_c[..., None] * dEi_sum[:, :, None, :]
        dEi_ref[:, c] = dEi_c.astype(dEi_ref.dtype)

    # w = EuW_sum (+ eu) ; EuW_sum = Eu_msum @ Wr ; Eu_msum = Σ_n mu·Eu
    if target_aware:
        deu_ref[:] = _sum_t(dw).astype(deu_ref.dtype)
    else:
        deu_ref[:] = jnp.zeros(deu_ref.shape, deu_ref.dtype)
        dei_ref[:] = jnp.zeros(dei_ref.shape, dei_ref.dtype)
    Eu_msum = jnp.sum(Eu * mu[..., None], axis=2)
    dWr = dWr + jax.lax.dot_general(
        Eu_msum.reshape(BT * T, d), dw.reshape(BT * T, d),
        (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dEu_msum = jnp.dot(dw.reshape(BT * T, d), Wr.T,
                       preferred_element_type=jnp.float32).reshape(BT, T, d)
    dEu = dEu + mu[..., None] * dEu_msum[:, :, None, :]
    dEu_ref[:] = dEu.astype(dEu_ref.dtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dWr_ref[:] = jnp.zeros_like(dWr_ref)

    dWr_ref[:] += dWr


# The f32 intermediates at (n=10, d=32) pad to (8,128)-tiles — a ~6.4x
# physical blowup — so the default 16 MB scoped-VMEM limit OOMs at useful
# block sizes. v5e has far more physical VMEM; raise the scoped limit and
# let block-size tuning (CAND_TILE_B) find the perf sweet spot.
_VMEM_LIMIT = 100 * 1024 * 1024


def _params(interpret: bool):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


def _pad_b(x, Bp):
    B = x.shape[0]
    if Bp == B:
        return x
    return jnp.pad(x, ((0, Bp - B),) + ((0, 0),) * (x.ndim - 1))


def _specs(T, n, m, d, C, bt):
    blk = lambda shape: pl.BlockSpec((bt,) + shape,
                                     lambda g: (g,) + (0,) * len(shape),
                                     memory_space=pltpu.VMEM)
    wr = pl.BlockSpec((d, d), lambda g: (0, 0), memory_space=pltpu.VMEM)
    ins = [blk((T, n, d)), blk((C, T, m, d)), blk((T, n)), blk((C, T, m)),
           wr, blk((d,)), blk((C, d))]
    return blk, wr, ins


def _cand_fwd(Eu, Ei, mu, mi, Wr, eu, ei, *, target_aware: bool,
              tile_b: int = 128, interpret: bool = False
              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    B, T, n, d = Eu.shape
    C, m = Ei.shape[1], Ei.shape[3]
    bt = min(tile_b, B)
    Bp = -(-B // bt) * bt
    args = [_pad_b(Eu, Bp), _pad_b(Ei, Bp),
            _pad_b(mu.astype(jnp.float32), Bp),
            _pad_b(mi.astype(jnp.float32), Bp),
            Wr.astype(jnp.float32), _pad_b(eu, Bp), _pad_b(ei, Bp)]
    blk, _, ins = _specs(T, n, m, d, C, bt)
    out_dt = Eu.dtype
    cu, ci = pl.pallas_call(
        functools.partial(_cand_fwd_kernel, target_aware=target_aware),
        grid=(Bp // bt,),
        in_specs=ins,
        out_specs=(blk((C, T, d)), blk((C, T, d))),
        out_shape=(jax.ShapeDtypeStruct((Bp, C, T, d), out_dt),
                   jax.ShapeDtypeStruct((Bp, C, T, d), out_dt)),
        compiler_params=_params(interpret),
        interpret=interpret,
    )(*args)
    return cu[:B], ci[:B]


def _cand_bwd(Eu, Ei, mu, mi, Wr, eu, ei, dcu, dci, *, target_aware: bool,
              tile_b: int = 128, interpret: bool = False):
    B, T, n, d = Eu.shape
    C, m = Ei.shape[1], Ei.shape[3]
    bt = min(tile_b, B)
    Bp = -(-B // bt) * bt
    args = [_pad_b(Eu, Bp), _pad_b(Ei, Bp),
            _pad_b(mu.astype(jnp.float32), Bp),
            _pad_b(mi.astype(jnp.float32), Bp),
            Wr.astype(jnp.float32), _pad_b(eu, Bp), _pad_b(ei, Bp),
            _pad_b(dcu, Bp), _pad_b(dci, Bp)]
    blk, wr, ins = _specs(T, n, m, d, C, bt)
    ins = ins + [blk((C, T, d)), blk((C, T, d))]
    dei_spec = pl.BlockSpec((C, bt, d), lambda g: (0, g, 0),
                            memory_space=pltpu.VMEM)
    dEu, dEi, deu, dei, dWr = pl.pallas_call(
        functools.partial(_cand_bwd_kernel, target_aware=target_aware),
        grid=(Bp // bt,),
        in_specs=ins,
        out_specs=(blk((T, n, d)), blk((C, T, m, d)), blk((d,)),
                   dei_spec, wr),
        out_shape=(jax.ShapeDtypeStruct((Bp, T, n, d), Eu.dtype),
                   jax.ShapeDtypeStruct((Bp, C, T, m, d), Ei.dtype),
                   jax.ShapeDtypeStruct((Bp, d), eu.dtype),
                   jax.ShapeDtypeStruct((C, Bp, d), ei.dtype),
                   jax.ShapeDtypeStruct((d, d), jnp.float32)),
        compiler_params=_params(interpret),
        interpret=interpret,
    )(*args)
    dei = jnp.transpose(dei, (1, 0, 2))
    return (dEu[:B], dEi[:B], dWr.astype(Wr.dtype), deu[:B], dei[:B])


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def cross_coattn_cand(Eu, Ei, mu, mi, Wr, eu, ei, target_aware: bool = True,
                      tile_b: int = 128, interpret: bool = False):
    """Fused candidates-form co-attention (sum pool), fwd + bwd in Pallas.

    Eu [B,T,n,d] (shared user side, read ONCE), Ei [B,C,T,m,d],
    mu [B,T,n], mi [B,C,T,m] (bool or 0/1), Wr [d,d],
    eu [B,d], ei [B,C,d] (target-projected) -> cu, ci [B,C,T,d]."""
    return _cand_fwd(Eu, Ei, mu, mi, Wr, eu, ei, target_aware=target_aware,
                     tile_b=tile_b, interpret=interpret)


def _vjp_fwd(Eu, Ei, mu, mi, Wr, eu, ei, target_aware, tile_b, interpret):
    out = _cand_fwd(Eu, Ei, mu, mi, Wr, eu, ei, target_aware=target_aware,
                    tile_b=tile_b, interpret=interpret)
    return out, (Eu, Ei, mu, mi, Wr, eu, ei)


def _vjp_bwd(target_aware, tile_b, interpret, res, g):
    Eu, Ei, mu, mi, Wr, eu, ei = res
    dEu, dEi, dWr, deu, dei = _cand_bwd(
        Eu, Ei, mu, mi, Wr, eu, ei, g[0], g[1], target_aware=target_aware,
        tile_b=tile_b, interpret=interpret)
    return dEu, dEi, None, None, dWr, deu, dei


cross_coattn_cand.defvjp(_vjp_fwd, _vjp_bwd)
