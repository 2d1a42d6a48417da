"""Baseline models sharing the ScoreModel batch protocol
(SURVEY.md §2.3 #14: the reference ships same-protocol comparison models —
MF/SVD++-family, single-side sequential, etc.; exact roster unverifiable,
reference mount empty).

Implemented TPU-first, same input batch dict as ScoreModel so the whole
train/eval driver works unchanged:

  MFModel          classic matrix factorization with biases (SVD-family)
  PopModel         popularity-only sanity floor (item bias alone)
  SelfAttnEncoder  single-block self-attention sequence encoder — plugs into
                   ScoreModel as seq encoder variant 'selfattn'
                   (SASRec-style, vs. the GRU default)
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from .coattn import masked_softmax
from .embed import EmbeddingTables


class MFModel(nn.Module):
    """score = <eu, ei> + b_u + b_i + b  (ignores histories)."""

    cfg: ModelConfig
    num_users: int
    num_items: int
    lookup_fn: object = None
    use_pallas_coattn: bool = False

    def setup(self):
        cfg = self.cfg
        self.tables = EmbeddingTables(
            num_users=self.num_users, num_items=self.num_items,
            dim=cfg.embed_dim, shared=cfg.shared_table, name="tables")
        self.user_bias = EmbeddingTables(
            num_users=self.num_users, num_items=0, dim=1, name="user_bias")
        self.item_bias = EmbeddingTables(
            num_users=0, num_items=self.num_items, dim=1, name="item_bias")
        self.bias = self.param("bias", nn.initializers.zeros_init(), ())

    def _score(self, user, items):
        # user: [B], items: [B] or [B, C]
        eu = self.tables.user_emb(user)
        ei = self.tables.item_emb(items)
        bu = self.user_bias.user_emb(user)[..., 0]
        bi = self.item_bias.item_emb(items)[..., 0]
        if items.ndim > user.ndim:
            eu = eu[:, None]
            bu = bu[:, None]
        return jnp.sum(eu * ei, axis=-1) + bu + bi + self.bias

    def __call__(self, batch: dict) -> jnp.ndarray:
        return self._score(batch["user"], batch["item"])

    def score_candidates(self, batch: dict) -> jnp.ndarray:
        return self._score(batch["user"], batch["cand"])


class PopModel(nn.Module):
    """Popularity floor: score = b_i. Any sequential model must beat it."""

    cfg: ModelConfig
    num_users: int
    num_items: int
    lookup_fn: object = None
    use_pallas_coattn: bool = False

    def setup(self):
        self.item_bias = EmbeddingTables(
            num_users=0, num_items=self.num_items, dim=1, name="item_bias")

    def __call__(self, batch: dict) -> jnp.ndarray:
        return self.item_bias.item_emb(batch["item"])[..., 0]

    def score_candidates(self, batch: dict) -> jnp.ndarray:
        return self.item_bias.item_emb(batch["cand"])[..., 0]


class SelfAttnEncoder(nn.Module):
    """One pre-LN self-attention block over the slot sequence (SASRec-style
    alternative to the GRU; causal over time slots, length-masked).

    xs: [B, T, d], mask: [B, T] -> [B, T, features]
    """

    features: int
    num_heads: int = 2

    @nn.compact
    def __call__(self, xs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        B, T, d = xs.shape
        h = nn.Dense(self.features, name="in_proj")(xs)
        # causal + validity attention mask [B, 1, T, T]
        causal = jnp.tril(jnp.ones((T, T), bool))
        attn_mask = (mask[:, None, None, :] & causal[None, None, :, :])
        y = nn.LayerNorm(name="ln1")(h)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.features,
            name="mha")(y, y, mask=attn_mask)
        h = h + y
        y = nn.LayerNorm(name="ln2")(h)
        y = nn.Dense(self.features * 2, name="ff1")(y)
        y = nn.relu(y)
        y = nn.Dense(self.features, name="ff2")(y)
        h = h + y
        # zero out invalid slots so downstream pooling sees clean states
        return h * mask[..., None].astype(h.dtype)
