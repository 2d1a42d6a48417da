"""Numeric / bounds sanitizers (SURVEY.md §5 'Race detection / sanitizers').

JAX's functional model removes device data races by construction; the
realistic corruption class here is out-of-range ids silently gathering
garbage rows (the recsys analog of a race). Tools:

  * enable_nan_checks()      jax_debug_nans for CI numeric sanitizing
  * check_batch_bounds(...)  host-side id-range validation of a batch
  * checked_lookup(...)      checkify-wrapped gather that errors (not
                             clamps) on out-of-range ids, for debug runs
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import checkify


def enable_nan_checks(on: bool = True) -> None:
    jax.config.update("jax_debug_nans", on)


def check_batch_bounds(batch: dict, num_users: int, num_items: int) -> None:
    """Raise ValueError on any id outside [0, num_*] (0 = padding)."""
    def _chk(name, arr, hi):
        a = np.asarray(arr)
        if a.size and (a.min() < 0 or a.max() > hi):
            raise ValueError(
                f"{name}: ids outside [0, {hi}] (min {a.min()}, "
                f"max {a.max()})")

    if "user" in batch:
        _chk("user", batch["user"], num_users)
    for key in ("item", "cand", "u_hist"):
        if key in batch:
            _chk(key, batch[key], num_items)
    if "i_hist" in batch:
        _chk("i_hist", batch["i_hist"], num_users)


def checked_lookup(table: jnp.ndarray, ids: jnp.ndarray):
    """Gather that *errors* on out-of-range ids instead of clamping.

    Returns (err, rows); call err.throw() (or inspect it) after the jitted
    computation. Usable as a debug drop-in for EmbeddingTables.lookup_fn via
    `lambda t, i: checked_lookup(t, i)[1]` under checkify.checkify.
    """
    def body(table, ids):
        checkify.check(jnp.all(ids >= 0), "negative embedding id")
        checkify.check(jnp.all(ids < table.shape[0]),
                       "embedding id beyond table rows")
        return jnp.take(table, ids, axis=0)

    return checkify.checkify(body)(table, ids)
