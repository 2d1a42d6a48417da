"""Interaction scorer + loss (SURVEY.md §2.3 #10-11; paper §3.5).

Score: z = MLP([h_u; h_i; eu; ei; h_u * h_i; eu * ei]) -> logit.
Loss: pointwise BCE over positives + sampled negatives, plus L2 on the
embedding tables (applied in the train step, where the table params are
visible).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp
import optax


class Scorer(nn.Module):
    """MLP interaction head over a list of feature vectors.

    Dropout (when rate > 0 and train=True) follows each hidden activation —
    the reference-era CTR regularization knob; requires an apply-time
    rngs={'dropout': key}.
    """

    mlp_dims: Sequence[int] = (64, 32)
    dropout: float = 0.0
    dtype: str = "float32"   # hidden-layer compute dtype; logits always f32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray],
                 train: bool = False) -> jnp.ndarray:
        cdt = jnp.dtype(self.dtype)
        x = jnp.concatenate([f.astype(cdt) for f in feats], axis=-1)
        for i, w in enumerate(self.mlp_dims):
            x = nn.Dense(w, name=f"mlp_{i}", dtype=cdt)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, name=f"drop_{i}")(
                x, deterministic=not train)
        logit = nn.Dense(1, name="out", dtype=jnp.float32)(x)
        return jnp.squeeze(logit, axis=-1)


def bce_loss(logits: jnp.ndarray, labels: jnp.ndarray,
             weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean sigmoid binary cross-entropy (the reference's pointwise loss).

    weights (optional, same shape as logits) drop degenerate elements from
    the mean — e.g. in-batch negatives that collide with their positive."""
    ell = optax.sigmoid_binary_cross_entropy(logits, labels)
    if weights is None:
        return jnp.mean(ell)
    return jnp.sum(ell * weights) / jnp.maximum(jnp.sum(weights), 1.0)
