"""Baseline models sharing the ScoreModel batch protocol
(SURVEY.md §2.3 #14: the reference ships same-protocol comparison models —
"classical MF (SVD++-family), single-side sequential (GRU4Rec-, Caser-,
SASRec-, RRN-style), dual-side (DELF-style)"; exact roster unverifiable,
reference mount empty — this is the paper's §4.2 baselines table).

Implemented TPU-first, same input batch dict as ScoreModel so the whole
train/eval driver works unchanged:

  MFModel          classic matrix factorization with biases (SVD-family)
  SVDPPModel       SVD++: MF + implicit-feedback factor from the user's
                   interacted items (the classical-MF roster entry)
  PopModel         popularity-only sanity floor (item bias alone)
  DELFModel        dual-embedding deep latent factor model: id embeddings +
                   history-based embeddings on BOTH sides, fused by pairwise
                   interaction MLPs (DELF-style dual-side, no recurrence)
  SelfAttnEncoder  single-block self-attention sequence encoder — plugs into
                   ScoreModel as seq encoder variant 'selfattn'
                   (SASRec-style, vs. the GRU default)
  CaserEncoder     causal horizontal-CNN sequence encoder — seq encoder
                   variant 'caser' (Caser-style; convolutions are left-padded
                   so slot t never sees t' > t)

The sequential roster entries are flag combos of ScoreModel itself (named
presets in score_tpu.config.PRESETS): gru4rec = single-side GRU over slot
means, rrn = dual-side GRUs, sasrec/caser = encoder swaps.
"""

from __future__ import annotations

import flax.linen as nn
import jax
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

    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        return self._score(batch["user"], batch["item"])

    def score_candidates(self, batch: dict, train: bool = False) -> jnp.ndarray:
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

    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        return self.item_bias.item_emb(batch["item"])[..., 0]

    def score_candidates(self, batch: dict, train: bool = False) -> jnp.ndarray:
        return self.item_bias.item_emb(batch["cand"])[..., 0]


def _hist_mask(cnt: jnp.ndarray, fanout: int,
               slot_valid: jnp.ndarray) -> jnp.ndarray:
    """[..., T, k] bool validity for a padded history (j < cnt and t < t*)."""
    j = jnp.arange(fanout, dtype=cnt.dtype)
    j = j.reshape((1,) * cnt.ndim + (-1,))
    return (j < cnt[..., None]) & slot_valid[..., None]


def _masked_mean_flat(E: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of E[..., T, k, d] over all valid (t, j); zero if none valid."""
    m = mask[..., None].astype(E.dtype)
    s = jnp.sum(E * m, axis=(-3, -2))
    c = jnp.sum(m, axis=(-3, -2))
    return s / jnp.maximum(c, 1.0)


class SVDPPModel(nn.Module):
    """SVD++ (the classical-MF roster entry beyond plain MF):

        ŷ = b + b_u + b_i + < e_u + |N(u)|^{-1/2} Σ_{j∈N(u)} y_j , e_i >

    N(u) is the user's full valid history (all slots t < t*, the same
    no-leakage contract as ScoreModel); y is a separate implicit item table.
    Candidates form: the implicit factor is computed once per user.
    """

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
        self.implicit = EmbeddingTables(
            num_users=0, num_items=self.num_items, dim=cfg.embed_dim,
            name="implicit_tables")
        self.user_bias = EmbeddingTables(
            num_users=self.num_users, num_items=0, dim=1, name="user_bias")
        self.item_bias = EmbeddingTables(
            num_users=0, num_items=self.num_items, dim=1, name="item_bias")
        self.bias = self.param("bias", nn.initializers.zeros_init(), ())

    def _user_vec(self, batch):
        eu = self.tables.user_emb(batch["user"])                  # [B, d]
        mask = _hist_mask(batch["u_cnt"], batch["u_hist"].shape[-1],
                          batch["slot_valid"])                    # [B, T, n]
        Y = self.implicit.item_emb(batch["u_hist"])               # [B,T,n,d]
        m = mask[..., None].astype(Y.dtype)
        s = jnp.sum(Y * m, axis=(1, 2))                           # [B, d]
        cnt = jnp.sum(m, axis=(1, 2))                             # [B, 1]
        return eu + s * jax.lax.rsqrt(jnp.maximum(cnt, 1.0))

    def score_candidates(self, batch: dict, train: bool = False) -> jnp.ndarray:
        pu = self._user_vec(batch)                                # [B, d]
        ei = self.tables.item_emb(batch["cand"])                  # [B, C, d]
        bu = self.user_bias.user_emb(batch["user"])[..., 0]       # [B]
        bi = self.item_bias.item_emb(batch["cand"])[..., 0]       # [B, C]
        return jnp.sum(pu[:, None] * ei, axis=-1) + bu[:, None] + bi + self.bias

    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        cb = dict(batch, cand=batch["item"][:, None])
        return self.score_candidates(cb)[:, 0]


class DELFModel(nn.Module):
    """DELF-style dual-embedding deep latent factor model (the dual-side,
    non-recurrent roster entry): each side carries an id embedding AND a
    history-based embedding (user: mean of interacted-item embeddings; item:
    mean of interacting-user embeddings), fused by four pairwise interaction
    MLPs over the cross pairs, then a linear head.

    Uses both sides' histories but no time structure — exactly the capability
    gap SCoRe's slot sequence + co-attention closes (ablation anchor).
    """

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
        # second embedding set, used via histories (the "dual" in DELF)
        self.hist_tables = EmbeddingTables(
            num_users=self.num_users, num_items=self.num_items,
            dim=cfg.embed_dim, name="hist_tables")
        h = cfg.hidden_dim
        self.pair_mlps = [nn.Dense(h, name=f"pair_{k}") for k in
                          ("ee", "eq", "pe", "pq")]
        self.head = nn.Dense(1, name="head")

    def score_candidates(self, batch: dict, train: bool = False) -> jnp.ndarray:
        eu = self.tables.user_emb(batch["user"])                  # [B, d]
        ei = self.tables.item_emb(batch["cand"])                  # [B, C, d]
        mu = _hist_mask(batch["u_cnt"], batch["u_hist"].shape[-1],
                        batch["slot_valid"])                      # [B, T, n]
        pu = _masked_mean_flat(
            self.hist_tables.item_emb(batch["u_hist"]), mu)       # [B, d]
        mi = _hist_mask(batch["i_cnt"], batch["i_hist"].shape[-1],
                        batch["slot_valid"][:, None])             # [B,C,T,m]
        qi = _masked_mean_flat(
            self.hist_tables.user_emb(batch["i_hist"]), mi)       # [B, C, d]

        C = ei.shape[1]
        eu_b = jnp.broadcast_to(eu[:, None], ei.shape)
        pu_b = jnp.broadcast_to(pu[:, None], ei.shape)
        pairs = [(eu_b, ei), (eu_b, qi), (pu_b, ei), (pu_b, qi)]
        feats = [nn.relu(mlp(jnp.concatenate([a, b], axis=-1)))
                 for mlp, (a, b) in zip(self.pair_mlps, pairs)]
        return self.head(jnp.concatenate(feats, axis=-1))[..., 0]

    def __call__(self, batch: dict, train: bool = False) -> jnp.ndarray:
        cb = dict(batch,
                  cand=batch["item"][:, None],
                  i_hist=batch["i_hist"][:, None],
                  i_cnt=batch["i_cnt"][:, None])
        return self.score_candidates(cb)[:, 0]


class CaserEncoder(nn.Module):
    """Caser-style causal CNN sequence encoder (seq encoder variant 'caser').

    Horizontal convolutions of several window sizes, made CAUSAL (left-padded)
    so the output at slot t is a function of slots <= t only — Caser's
    union-level pattern capture adapted to the sequence-to-sequence interface
    the driver's pooling expects. The vertical branch (Caser collapses time
    with a full-length vertical filter) becomes a causal running mean.

    xs: [B, T, d], mask: [B, T] -> [B, T, features]
    """

    features: int
    widths: tuple = (2, 3, 4)

    @nn.compact
    def __call__(self, xs: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        mf = mask[..., None].astype(xs.dtype)
        xs = xs * mf
        outs = []
        for w in self.widths:
            c = nn.Conv(self.features, kernel_size=(w,), padding="CAUSAL",
                        name=f"hconv_{w}")(xs)
            outs.append(nn.relu(c))
        # causal running mean over valid slots (vertical-filter analog)
        cnt = jnp.cumsum(mf, axis=1)
        vert = jnp.cumsum(xs, axis=1) / jnp.maximum(cnt, 1.0)
        outs.append(nn.Dense(self.features, name="vproj")(vert))
        h = nn.Dense(self.features, name="out")(
            jnp.concatenate(outs, axis=-1))
        return nn.relu(h) * mf


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
