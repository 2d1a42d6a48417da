"""Per-slot neighbor-set aggregation, including SCoRe's core novelty:
cross-neighbor co-attention (SURVEY.md §2.3 #8, §2.4 step 3; paper §3.3).

Three aggregation modes, matching the BASELINE.json config ladder:
  slot_mean    masked mean of the slot's neighbor embeddings   (configs0/1)
  SlotAttention   per-side target-aware attention              (configs2)
  CrossCoAttention   the full bilinear relation matrix
      M^t = Eu_t Wr Ei_t^T with dual masked softmax            (configs3+)

All functions are pure jnp (the XLA-fused reference implementation); the
Pallas fused kernel in score_tpu.kernels.coattn is equivalence-gated against
`cross_coattn_ref` here.

Padding semantics (SURVEY.md §7.3 item 6): an all-padded slot must yield an
exactly-zero aggregated vector and exactly-zero attention mass — implemented
with the where-trick around softmax, unit-tested against numpy.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

_NEG = -1e9


def masked_softmax(scores: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Softmax over the last axis; rows with no valid entry give all-zeros."""
    scores = jnp.where(mask, scores, _NEG)
    scores = scores - jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores) * mask
    denom = jnp.sum(e, axis=-1, keepdims=True)
    return e / jnp.maximum(denom, 1e-20)


def slot_mean(E: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over the neighbor axis. E: [..., n, d], mask: [..., n]."""
    m = mask[..., None].astype(E.dtype)
    s = jnp.sum(E * m, axis=-2)
    c = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
    return s / c


class SlotAttention(nn.Module):
    """Per-side target-aware attention over each slot's neighbor set
    (configs2: one-hop aggregation with no cross terms).

    scores = (E W) . target / sqrt(d);  c_t = softmax(scores)^T E
    """

    @nn.compact
    def __call__(self, E: jnp.ndarray, mask: jnp.ndarray,
                 target: jnp.ndarray) -> jnp.ndarray:
        # E: [B, T, n, d], mask: [B, T, n], target: [B, d] -> [B, T, d]
        d = E.shape[-1]
        # zero init => uniform attention at t=0, i.e. this rung starts as
        # exact masked-mean (configs1 behavior) and learns to deviate —
        # random init made richer rungs start worse than simpler ones
        W = self.param("w", nn.initializers.zeros_init(), (d, d))
        # project the target, not the neighbors: (E W) . t == E . (W t), and
        # W t is O(B d^2) vs O(B T n d^2) — measured 8 ms/step difference
        # (XLA did not reassociate this on its own)
        tq = jnp.einsum("de,be->bd", W, target)
        scores = jnp.einsum("btnd,bd->btn", E, tq) / jnp.sqrt(
            jnp.asarray(d, E.dtype))
        a = masked_softmax(scores, mask)
        return jnp.einsum("btn,btnd->btd", a, E)


def cross_coattn_ref(Eu, Ei, mu, mi, Wr, eu, ei, *, pool: str = "sum",
                     target_aware: bool = True):
    """Pure-function cross-neighbor co-attention (paper §3.3; SURVEY.md §2.4
    step 3). The contract the Pallas kernel must match bit-for-bit (f32).

    Args:
      Eu: [B, T, n, d] user-side neighbor (item) embeddings
      Ei: [B, T, m, d] item-side neighbor (user) embeddings
      mu: [B, T, n] bool validity, mi: [B, T, m]
      Wr: [d, d] bilinear relation weight
      eu: [B, d] target user emb, ei: [B, d] target item emb
      pool: 'sum' | 'max' pooling of the relation matrix over the opposite side
      target_aware: add Eu.ei / Ei.eu pre-softmax terms

    Returns:
      cu: [B, T, d], ci: [B, T, d] per-slot aggregated vectors.
    """
    d = Eu.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.asarray(d, Eu.dtype))

    if pool == "sum":
        # Sum-pooling never needs the relation matrix: pooled user-side
        # scores are su_i = sum_j mask_j (Eu_i Wr) . Ei_j
        #             = (Eu_i Wr) . (sum_j mask_j Ei_j),
        # which collapses the O(B T n m d) batched tiny matmuls (MXU-hostile
        # at n,m ~ 10) to O(B T (n+m) d). Exact same math as materializing
        # M = Eu Wr Ei^T and masked-summing it; rows with mu_i = 0 differ
        # pre-softmax but are zeroed by the masked softmax either way.
        EuW = jnp.einsum("btnd,de->btne", Eu, Wr)
        Ei_sum = jnp.sum(Ei * mi[..., None].astype(Ei.dtype), axis=-2)
        EuW_sum = jnp.sum(EuW * mu[..., None].astype(Eu.dtype), axis=-2)
        su = jnp.einsum("btnd,btd->btn", EuW, Ei_sum) * scale
        si = jnp.einsum("btmd,btd->btm", Ei, EuW_sum) * scale
    else:  # max
        # Relation matrix M[b,t,n,m] = Eu Wr Ei^T
        M = jnp.einsum("btnd,de,btme->btnm", Eu, Wr, Ei) * scale
        pair_mask = mu[..., :, None] & mi[..., None, :]
        Mm = jnp.where(pair_mask, M, _NEG)
        su = jnp.max(Mm, axis=-1)
        si = jnp.max(Mm, axis=-2)
        # rows with no valid opposite entry: fall back to 0 pre-softmax
        su = jnp.where(mi.any(axis=-1, keepdims=True), su, 0.0)
        si = jnp.where(mu.any(axis=-1, keepdims=True), si, 0.0)

    if target_aware:
        su = su + jnp.einsum("btnd,bd->btn", Eu, ei) * scale
        si = si + jnp.einsum("btmd,bd->btm", Ei, eu) * scale

    a = masked_softmax(su, mu)              # [B,T,n]
    b = masked_softmax(si, mi)              # [B,T,m]
    cu = jnp.einsum("btn,btnd->btd", a, Eu)
    ci = jnp.einsum("btm,btmd->btd", b, Ei)
    return cu, ci


class CrossCoAttention(nn.Module):
    """flax wrapper owning the Wr param around `cross_coattn_ref` (or the
    Pallas kernel when `use_pallas`)."""

    pool: str = "sum"
    target_aware: bool = True
    use_pallas: bool = False

    @nn.compact
    def __call__(self, Eu, Ei, mu, mi, eu, ei):
        d = Eu.shape[-1]
        # zero init: relation scores start at 0 => dual masked-mean
        # aggregation (see SlotAttention note)
        Wr = self.param("wr", nn.initializers.zeros_init(), (d, d))
        if self.use_pallas:
            from score_tpu.kernels.coattn import cross_coattn_pallas
            return cross_coattn_pallas(
                Eu, Ei, mu, mi, Wr, eu, ei, pool=self.pool,
                target_aware=self.target_aware)
        return cross_coattn_ref(Eu, Ei, mu, mi, Wr, eu, ei, pool=self.pool,
                                target_aware=self.target_aware)
