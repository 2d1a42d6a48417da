"""Metric functions vs sklearn / brute force (SURVEY.md §4.2)."""

import jax.numpy as jnp
import numpy as np
from sklearn.metrics import roc_auc_score

from score_tpu.metrics import auc, ranking_metrics


def test_auc_vs_sklearn(rng):
    scores = rng.normal(size=500).astype(np.float32)
    labels = (rng.random(500) > 0.7).astype(np.float32)
    got = float(auc(jnp.asarray(scores), jnp.asarray(labels)))
    want = roc_auc_score(labels, scores)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_auc_with_ties(rng):
    scores = rng.integers(0, 5, size=300).astype(np.float32)  # heavy ties
    labels = (rng.random(300) > 0.5).astype(np.float32)
    got = float(auc(jnp.asarray(scores), jnp.asarray(labels)))
    want = roc_auc_score(labels, scores)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_auc_weights_mask_rows(rng):
    scores = rng.normal(size=400).astype(np.float32)
    labels = (rng.random(400) > 0.6).astype(np.float32)
    w = (rng.random(400) > 0.25).astype(np.float32)
    got = float(auc(jnp.asarray(scores), jnp.asarray(labels), jnp.asarray(w)))
    keep = w > 0
    want = roc_auc_score(labels[keep], scores[keep])
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_auc_large_scale_no_overflow(rng):
    """Regression: n_pos * n_neg > 2^31 overflowed int32 and produced
    AUC = 630 at real eval scale (caught in verification, round 1)."""
    n_pos, n_neg = 30_000, 110_000
    scores = np.concatenate([
        rng.normal(loc=0.3, size=n_pos),
        rng.normal(loc=0.0, size=n_neg)]).astype(np.float32)
    labels = np.concatenate([
        np.ones(n_pos), np.zeros(n_neg)]).astype(np.float32)
    got = float(auc(jnp.asarray(scores), jnp.asarray(labels)))
    want = roc_auc_score(labels, scores)
    assert 0.0 <= got <= 1.0
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_auc_degenerate():
    assert float(auc(jnp.asarray([1.0, 2.0]), jnp.asarray([1.0, 1.0]))) == 0.5


def brute_rank_metrics(pos, neg, ks):
    B, N = neg.shape
    out = {f"hr@{k}": 0.0 for k in ks}
    out.update({f"ndcg@{k}": 0.0 for k in ks})
    out["mrr"] = 0.0
    for b in range(B):
        r = 1 + (neg[b] > pos[b]).sum() + 0.5 * (neg[b] == pos[b]).sum()
        for k in ks:
            if r <= k:
                out[f"hr@{k}"] += 1.0
                out[f"ndcg@{k}"] += 1.0 / np.log2(1 + r)
        out["mrr"] += 1.0 / r
    return {k: v / B for k, v in out.items()}


def test_ranking_metrics_vs_brute(rng):
    B, N = 64, 30
    pos = rng.normal(size=B).astype(np.float32)
    neg = rng.normal(size=(B, N)).astype(np.float32)
    # inject exact ties
    neg[0, 0] = pos[0]
    got = {k: float(v) for k, v in ranking_metrics(
        jnp.asarray(pos), jnp.asarray(neg), ks=(1, 5, 10)).items()}
    want = brute_rank_metrics(pos, neg, (1, 5, 10))
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, err_msg=k)


def test_ranking_metrics_weights(rng):
    B, N = 16, 10
    pos = rng.normal(size=B).astype(np.float32)
    neg = rng.normal(size=(B, N)).astype(np.float32)
    w = np.ones(B, np.float32)
    w[10:] = 0.0
    got = {k: float(v) for k, v in ranking_metrics(
        jnp.asarray(pos), jnp.asarray(neg), ks=(5,),
        weights=jnp.asarray(w)).items()}
    want = brute_rank_metrics(pos[:10], neg[:10], (5,))
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, err_msg=k)
