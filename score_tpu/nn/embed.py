"""Embedding tables + lookup (SURVEY.md §2.3 #7).

The reference uses `tf.get_variable` + `tf.nn.embedding_lookup` on one GPU.
Here the tables are flax params whose lookup goes through a pluggable
`lookup_fn(table, ids) -> emb` so the same model runs with:

  * local take (single chip, configs0-3),
  * GSPMD row-sharded tables (jit + sharding constraint; XLA inserts the
    collectives),
  * the explicit shard_map psum / all-to-all exchange paths in
    `score_tpu.sharding` (configs4, BASELINE.json:11).

Row 0 of every table is the padding row; padding is handled by masks at the
use sites (attention / mean / GRU-step masking), never by zeroing the row.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp


def local_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Plain gather; under jit with a row-sharded table XLA partitions this."""
    return jnp.take(table, ids, axis=0)


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


LookupFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


class EmbeddingTables(nn.Module):
    """User/item tables; `shared=True` packs both into one table (configs0).

    Shared layout: index 0 = pad, 1..num_items = items, num_items+1.. = users.
    """

    num_users: int
    num_items: int
    dim: int
    shared: bool = False
    param_dtype: str = "float32"
    lookup_fn: Optional[LookupFn] = None
    # Row counts are rounded up so row-sharding over any mesh 'rows' axis
    # that divides this multiple needs no repadding; the pad rows are never
    # addressed by valid ids.
    row_multiple: int = 64

    def setup(self):
        init = nn.initializers.normal(stddev=0.01)
        pdt = jnp.dtype(self.param_dtype)
        if self.shared:
            rows = round_up(1 + self.num_items + self.num_users,
                            self.row_multiple)
            self.table = self.param("table", init, (rows, self.dim), pdt)
        else:
            self.user_table = self.param(
                "user_table", init,
                (round_up(1 + self.num_users, self.row_multiple), self.dim),
                pdt)
            self.item_table = self.param(
                "item_table", init,
                (round_up(1 + self.num_items, self.row_multiple), self.dim),
                pdt)

    def _lookup(self, table, ids):
        fn = self.lookup_fn or local_lookup
        out = fn(table, ids)
        if isinstance(out, tuple):
            # sharded lookups (a2a_lookup with_overflow) also return an
            # overflow counter: sow it so the train loop can surface
            # capacity overflow instead of silently reading aliased rows
            # (SURVEY.md §7.3 item 1). sow is a no-op unless the caller
            # requests mutable=['diagnostics'].
            emb, overflow = out
            self.sow("diagnostics", "a2a_overflow", overflow,
                     init_fn=lambda: jnp.zeros((), jnp.int32),
                     reduce_fn=lambda a, b: a + b)
            return emb
        return out

    def user_emb(self, ids: jnp.ndarray) -> jnp.ndarray:
        if self.shared:
            shifted = jnp.where(ids > 0, ids + self.num_items, 0)
            return self._lookup(self.table, shifted)
        return self._lookup(self.user_table, ids)

    def item_emb(self, ids: jnp.ndarray) -> jnp.ndarray:
        if self.shared:
            return self._lookup(self.table, ids)
        return self._lookup(self.item_table, ids)
