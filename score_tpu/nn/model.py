"""The SCoRe model family, assembled from shared blocks (SURVEY.md §2.3 #8-10,
§2.4). One flax module covers the whole BASELINE.json config ladder via
ModelConfig flags:

  configs0  sides='user',  slot_agg='mean',   seq_pool='last', shared_table
  configs1  sides='dual',  slot_agg='mean',   seq_pool='attn'
  configs2  sides='dual',  slot_agg='attn',   seq_pool='attn'
  configs3+ sides='dual',  slot_agg='coattn', seq_pool='attn', target_aware

Forward semantics per SURVEY.md §2.4 steps 2-5. Input batch (from
`score_tpu.graph.gather_batch`):
  user[B], item[B], slot[B] (t*), u_hist[B,T,n] item ids, u_cnt[B,T],
  i_hist[B,T,m] user ids, i_cnt[B,T], slot_valid[B,T] (t < t*).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ..config import ModelConfig
from .coattn import CrossCoAttention, SlotAttention, slot_mean
from .embed import EmbeddingTables, LookupFn
from .encoder import GRU, AttnPool, last_pool
from .scorer import Scorer


def _nbr_mask(cnt: jnp.ndarray, fanout: int,
              slot_valid: jnp.ndarray) -> jnp.ndarray:
    """[B,T,k] bool: neighbor j of slot t valid iff j < cnt[t] and t < t*."""
    j = jnp.arange(fanout, dtype=cnt.dtype)[None, None, :]
    return (j < cnt[..., None]) & slot_valid[..., None]


class ScoreModel(nn.Module):
    """Dual-side neighbor-based sequential scorer (the SCoRe family)."""

    cfg: ModelConfig
    num_users: int
    num_items: int
    lookup_fn: Optional[LookupFn] = None
    use_pallas_coattn: bool = False

    @nn.compact
    def __call__(self, batch: dict) -> jnp.ndarray:
        cfg = self.cfg
        cdt = jnp.dtype(cfg.compute_dtype)
        tables = EmbeddingTables(
            num_users=self.num_users, num_items=self.num_items,
            dim=cfg.embed_dim, shared=cfg.shared_table,
            param_dtype=cfg.param_dtype, lookup_fn=self.lookup_fn,
            name="tables")

        eu = tables.user_emb(batch["user"]).astype(cdt)          # [B, d]
        ei = tables.item_emb(batch["item"]).astype(cdt)          # [B, d]
        sv = batch["slot_valid"]                                 # [B, T]

        # --- user side: neighbors are items the user touched per slot ---
        Eu = tables.item_emb(batch["u_hist"]).astype(cdt)        # [B,T,n,d]
        mu = _nbr_mask(batch["u_cnt"], Eu.shape[2], sv)

        dual = cfg.sides == "dual"
        if dual:
            Ei = tables.user_emb(batch["i_hist"]).astype(cdt)    # [B,T,m,d]
            mi = _nbr_mask(batch["i_cnt"], Ei.shape[2], sv)

        # --- per-slot aggregation (SURVEY.md §2.4 step 3) ---
        if cfg.slot_agg == "coattn":
            assert dual, "co-attention requires both sides"
            cu, ci = CrossCoAttention(
                pool=cfg.coattn_pool, target_aware=cfg.target_aware,
                use_pallas=self.use_pallas_coattn, name="coattn")(
                    Eu, Ei, mu, mi, eu, ei)
        elif cfg.slot_agg == "attn":
            cu = SlotAttention(name="slot_attn_u")(Eu, mu, ei)
            if dual:
                ci = SlotAttention(name="slot_attn_i")(Ei, mi, eu)
        else:  # mean
            cu = slot_mean(Eu, mu)
            if dual:
                ci = slot_mean(Ei, mi)

        # --- sequence encoding (step 4) ---
        def encoder(name):
            if cfg.seq_encoder == "selfattn":
                from .baselines import SelfAttnEncoder
                return SelfAttnEncoder(features=cfg.hidden_dim, name=name)
            return GRU(features=cfg.hidden_dim, name=name)

        hu_seq = encoder("gru_u")(cu, sv)
        if cfg.seq_pool == "attn":
            h_u = AttnPool(name="pool_u")(hu_seq, ei, sv)
        else:
            h_u = last_pool(hu_seq, sv)

        feats = [h_u, eu, ei, eu * ei]
        if dual:
            hi_seq = encoder("gru_i")(ci, sv)
            if cfg.seq_pool == "attn":
                h_i = AttnPool(name="pool_i")(hi_seq, eu, sv)
            else:
                h_i = last_pool(hi_seq, sv)
            feats = [h_u, h_i, eu, ei, h_u * h_i, eu * ei]

        # --- interaction scorer (step 5) ---
        return Scorer(mlp_dims=tuple(cfg.mlp_dims), name="scorer")(feats)
