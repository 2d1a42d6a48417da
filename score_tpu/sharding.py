"""Mesh + partition-spec layout (SURVEY.md §2.2, §5 'distributed backend').

The reference has no distributed anything (single-GPU TF1). The TPU build's
central distributed component is row-sharded embedding tables served by
collective lookups (BASELINE.json:5,11):

  mesh axes: ('data', 'rows') — 'data' spans the batch, 'rows' spans
  embedding-table rows (the recsys model-parallel axis; PP/SP/EP are
  deliberately out of scope, SURVEY.md §2.2).

Two lookup paths:
  * GSPMD (default): tables annotated P('rows', None); XLA partitions the
    gather and inserts collectives itself. Used by shard_state/shard_graph.
  * explicit shard_map paths in this module — `psum_lookup` (masked partial
    gather + psum, exact and simple) and `a2a_lookup` (the north star's
    all-to-all request/response exchange) — equivalence-tested on the fake
    8-device CPU mesh (SURVEY.md §4.2).
"""

from __future__ import annotations

import re
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
ROWS_AXIS = "rows"


def bringup(shard_cfg=None, coordinator_address: str | None = None,
            num_processes: int | None = None,
            process_id: int | None = None):
    """Distributed bring-up (SURVEY.md §3.5 init() stack).

    Multi-host: call once per host process before any jax op;
    `jax.distributed.initialize` wires the hosts (args optional when the
    cluster env provides them). Single-host: a no-op. Returns
    (mesh, lookup_fn) per the ShardingConfig.

    Transport below the collectives is XLA's (ICI intra-slice, DCN across) —
    nothing user-level to configure (SURVEY.md §2.2 'Communication
    backend').
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
    devices = jax.devices()
    if shard_cfg is None or shard_cfg.num_data * shard_cfg.num_rows <= 1:
        mesh = make_mesh(devices[:1], data=1, rows=1)
        return mesh, None
    n = shard_cfg.num_data * shard_cfg.num_rows
    mesh = make_mesh(devices[:n], data=shard_cfg.num_data,
                     rows=shard_cfg.num_rows)
    return mesh, make_lookup_fn(mesh, shard_cfg.lookup_mode)


def factor_mesh(n: int) -> tuple[int, int]:
    """Factor n devices into (data, rows): rows gets the larger power so
    table capacity scales with the slice; data >= 2 when possible so
    data-parallel grads are exercised."""
    if n == 1:
        return (1, 1)
    data = 2
    while n % data != 0:
        data += 1
    return (data, n // data)


def make_mesh(devices: Sequence[jax.Device] | None = None,
              data: int | None = None, rows: int | None = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if data is None or rows is None:
        data, rows = factor_mesh(len(devices))
    assert data * rows == len(devices), (data, rows, len(devices))
    arr = np.array(devices).reshape(data, rows)
    return Mesh(arr, (DATA_AXIS, ROWS_AXIS))


# --- SpecLayout: rule-based path -> PartitionSpec (SNIPPETS.md pattern) ---

_TABLE_RE = re.compile(r"table")


def state_spec(path_str: str, leaf) -> P:
    """Partition rule for TrainState leaves (params AND optimizer moments —
    adam mu/nu mirror the param tree, so the same path rule row-shards
    them)."""
    if _TABLE_RE.search(path_str) and getattr(leaf, "ndim", 0) == 2:
        return P(ROWS_AXIS, None)
    return P()


def _path_str(path) -> str:
    return jax.tree_util.keystr(path)


def shard_tree(mesh: Mesh, tree, spec_fn=state_spec):
    """device_put every leaf with its rule's NamedSharding."""
    def put(path, leaf):
        spec = spec_fn(_path_str(path), leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map_with_path(put, tree)


def shard_state(mesh: Mesh, state):
    """Shard a TrainState: tables (and their adam moments) over 'rows',
    dense params replicated."""
    return shard_tree(mesh, state)


def graph_spec(path_str: str, leaf) -> P:
    """Adjacency arrays [N+1, T, k] / counts [N+1, T] (node-major): shard the
    node axis over 'rows' so the graph store scales with the slice like the
    tables."""
    if getattr(leaf, "ndim", 0) == 3:
        return P(ROWS_AXIS, None, None)
    if getattr(leaf, "ndim", 0) == 2:
        return P(ROWS_AXIS, None)
    return P()


def shard_graph(mesh: Mesh, graph):
    return shard_tree(mesh, graph, graph_spec)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


# --- explicit shard_map lookup paths (M5; equivalence-gated vs local take) ---


def psum_lookup(mesh: Mesh, table: jnp.ndarray,
                ids: jnp.ndarray) -> jnp.ndarray:
    """Row-sharded lookup as masked partial gather + psum over 'rows'.

    Each rows-shard holds a contiguous row block; it gathers what it owns
    (out-of-range ids clamp to row 0 and are masked to zero) and a psum
    assembles full embeddings. The autodiff transpose is a masked
    scatter-add into the local shard — table grads stay row-sharded.

    table: [V, d] global (sharded P('rows', None));
    ids:   [...] global (sharded P('data') on axis 0).
    """
    V = table.shape[0]
    n_rows = mesh.shape[ROWS_AXIS]
    per = -(-V // n_rows)  # rows per shard (last shard may be ragged)

    def body(tbl, ids_):
        r = jax.lax.axis_index(ROWS_AXIS)
        lo = r * per
        local = ids_ - lo
        ok = (local >= 0) & (local < tbl.shape[0])
        emb = jnp.take(tbl, jnp.where(ok, local, 0), axis=0)
        emb = emb * ok[..., None].astype(emb.dtype)
        return jax.lax.psum(emb, ROWS_AXIS)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(ROWS_AXIS, None), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS))(table, ids)


def a2a_lookup(mesh: Mesh, table: jnp.ndarray,
               ids: jnp.ndarray) -> jnp.ndarray:
    """The north-star lookup (BASELINE.json:5): all-to-all request/response
    exchange over the 'rows' axis.

    Each (data, rows) shard buckets its local ids by owner shard
    (static-capacity buckets, SURVEY.md §7.3 item 1), all_to_all routes the
    requests to their owners, owners gather locally, a second all_to_all
    returns the embeddings, and a scatter un-permutes them.
    """
    V, d = table.shape
    n_rows = mesh.shape[ROWS_AXIS]
    assert V % n_rows == 0, (
        f"pad the table: {V} rows not divisible by rows axis {n_rows}")
    per = V // n_rows

    def body(tbl, ids_):
        flat = ids_.reshape(-1)
        n = flat.shape[0]
        n_pad = -(-n // n_rows) * n_rows
        flat_p = jnp.pad(flat, (0, n_pad - n))          # pad ids hit row 0
        chunk = n_pad // n_rows
        r = jax.lax.axis_index(ROWS_AXIS)
        # Each rows-shard serves 1/n_rows of this data-shard's ids: split the
        # request work across the axis instead of duplicating it.
        my = jax.lax.dynamic_slice(flat_p, (r * chunk,), (chunk,))
        owner = jnp.clip(my // per, 0, n_rows - 1)
        # Stable sort by owner -> contiguous per-owner buckets with static
        # capacity `chunk` (worst case: every id to one owner).
        order = jnp.argsort(owner)
        sorted_ids = my[order]
        sorted_owner = owner[order]
        oh = jax.nn.one_hot(sorted_owner, n_rows, dtype=jnp.int32)
        within = (jnp.cumsum(oh, axis=0) - 1)[jnp.arange(chunk), sorted_owner]
        req = jnp.zeros((n_rows, chunk), dtype=flat.dtype)
        req = req.at[sorted_owner, within].set(sorted_ids)
        # route requests to their owner shards
        req_recv = jax.lax.all_to_all(
            req, ROWS_AXIS, split_axis=0, concat_axis=0)
        local = req_recv - r * per                       # [n_rows, chunk]
        ok = (local >= 0) & (local < per)
        emb = jnp.take(tbl, jnp.where(ok, local, 0), axis=0)
        emb = emb * ok[..., None].astype(emb.dtype)
        # return responses to the requesters
        resp = jax.lax.all_to_all(
            emb, ROWS_AXIS, split_axis=0, concat_axis=0)
        gathered = resp[sorted_owner, within]            # [chunk, d]
        chunk_out = jnp.zeros((chunk, d), resp.dtype).at[order].set(gathered)
        # reassemble the full id list's embeddings on every rows-shard
        full = jax.lax.all_gather(chunk_out, ROWS_AXIS, axis=0, tiled=True)
        return full[:n].reshape(ids_.shape + (d,))

    # check_vma=False: the final tiled all_gather makes the output genuinely
    # replicated over 'rows', but VMA can't statically infer that.
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(ROWS_AXIS, None), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False)(table, ids)


def make_lookup_fn(mesh: Mesh, mode: str):
    """Embedding-lookup implementation for ShardingConfig.lookup_mode,
    pluggable into ScoreModel.lookup_fn. 'local'/None -> plain take (GSPMD
    partitions it); 'psum'/'a2a' -> the explicit shard_map exchanges."""
    import functools
    if mode in (None, "local"):
        return None
    if mode == "psum":
        return functools.partial(psum_lookup, mesh)
    if mode == "a2a":
        return functools.partial(a2a_lookup, mesh)
    raise ValueError(f"unknown lookup_mode {mode}")


def pad_rows(table: jnp.ndarray, n_rows: int) -> jnp.ndarray:
    """Pad a table's row count up to a multiple of the rows axis (the pad
    rows are zeros and are never addressed by valid ids)."""
    V = table.shape[0]
    pad = (-V) % n_rows
    if pad == 0:
        return table
    return jnp.pad(table, ((0, pad), (0, 0)))
