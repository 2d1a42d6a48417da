"""Device-side evaluation metrics: AUC, HR@K, NDCG@K, MRR
(SURVEY.md §2.3 #12; paper §4.2 protocol).

AUC uses the rank-sum (Mann-Whitney U) formulation with average-tie ranks —
exactly `sklearn.roc_auc_score` semantics (cross-checked in tests) but pure
jnp so it runs on device; ranks come from two `searchsorted` calls, O(n log n)
and SPMD-friendly (a psum of rank statistics in the sharded case,
SURVEY.md §7.3 item 4).

Ranking metrics follow the sampled-candidate protocol (SURVEY.md §2.4 step 7):
each positive is ranked against its N fixed negatives; ties count half.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp


def auc(scores: jnp.ndarray, labels: jnp.ndarray,
        weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pooled pointwise AUC with average-tie ranks. scores/labels: [N]."""
    if weights is None:
        weights = jnp.ones_like(scores)
    # Average ranks via searchsorted against the sorted score vector.
    # With weights in {0,1} we drop masked entries by pushing them to -inf
    # and subtracting their contribution from the counts.
    valid = weights > 0
    s = jnp.where(valid, scores, jnp.inf)          # masked sort high
    sorted_s = jnp.sort(s)
    lo = jnp.searchsorted(sorted_s, scores, side="left")
    hi = jnp.searchsorted(sorted_s, scores, side="right")
    # entries == inf (masked) all sit at the top; valid ranks are unaffected.
    rank = (lo + hi + 1).astype(jnp.float32) / 2.0  # 1-based average rank
    pos = (labels > 0) & valid
    neg = (labels <= 0) & valid
    # float32 throughout: n_pos * n_neg overflows int32 beyond ~46k x 46k
    # (seen at real eval scale: 24.5k positives x 2.45M pooled entries).
    # Mean-rank form keeps magnitudes ~n instead of ~n^2.
    n_pos = jnp.sum(pos).astype(jnp.float32)
    n_neg = jnp.sum(neg).astype(jnp.float32)
    mean_rank_pos = (jnp.sum(jnp.where(pos, rank, 0.0))
                     / jnp.maximum(n_pos, 1.0))
    a = (mean_rank_pos - (n_pos + 1.0) / 2.0) / jnp.maximum(n_neg, 1.0)
    return jnp.where((n_pos > 0) & (n_neg > 0), a, 0.5)


def ranking_metrics(pos_scores: jnp.ndarray, neg_scores: jnp.ndarray,
                    ks: Sequence[int] = (1, 5, 10),
                    weights: jnp.ndarray | None = None
                    ) -> Dict[str, jnp.ndarray]:
    """HR@K / NDCG@K / MRR of each positive among its sampled negatives.

    pos_scores: [B], neg_scores: [B, N], weights: [B] (0/1 for padded rows).
    Rank r = 1 + #(neg > pos) + 0.5 * #(neg == pos). With one relevant item,
    NDCG@K = 1/log2(1+r) if r <= K else 0; HR@K = [r <= K]; MRR = 1/r.
    """
    if weights is None:
        weights = jnp.ones_like(pos_scores)
    w = weights.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w), 1.0)
    gt = jnp.sum(neg_scores > pos_scores[:, None], axis=1)
    eq = jnp.sum(neg_scores == pos_scores[:, None], axis=1)
    rank = 1.0 + gt + 0.5 * eq                      # [B]
    out: Dict[str, jnp.ndarray] = {}
    for k in ks:
        hit = (rank <= k).astype(jnp.float32)
        out[f"hr@{k}"] = jnp.sum(hit * w) / denom
        ndcg = jnp.where(rank <= k, 1.0 / jnp.log2(1.0 + rank), 0.0)
        out[f"ndcg@{k}"] = jnp.sum(ndcg * w) / denom
    out["mrr"] = jnp.sum(w / rank) / denom
    # per-target (grouped) AUC, a.k.a. GAUC: with one positive vs N sampled
    # negatives, the group's AUC is the fraction of negatives ranked below
    # it (ties count half). The reference's AUC may be pooled or per-user
    # (SURVEY.md Appendix B item 5) — we report both.
    N = neg_scores.shape[1]
    out["gauc"] = jnp.sum((1.0 - (rank - 1.0) / N) * w) / denom
    return out
