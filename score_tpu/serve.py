"""Online scoring service (the p50-latency path, BASELINE.json:2).

The reference has no serving story (research code); this wraps the trained
model + device-resident graph into a warm, jitted candidate scorer:

    svc = ScoringService(cfg, dataset, params)        # or .from_checkpoint
    scores = svc.score(user_id, item_ids)             # [len(item_ids)]
    items, scores = svc.topk(user_id, k=10)           # over a candidate pool

All scoring shapes are padded to fixed buckets so repeated requests hit the
jit cache; histories are gathered on-device from the resident adjacency
(SURVEY.md §3.4: this path is what the driver's p50 metric times).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .data.schema import Dataset
from .graph import DeviceGraph, device_graph, gather_candidate_batch
from .train import build_model

_BUCKETS = (1, 16, 64, 256, 1024, 4096)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return -(-n // _BUCKETS[-1]) * _BUCKETS[-1]


class ScoringService:
    """Warm jitted scorer over the trained model + graph store."""

    def __init__(self, cfg: Config, ds: Dataset, params,
                 slot: Optional[int] = None):
        self.cfg = cfg
        self.graph: DeviceGraph = device_graph(ds.graph)
        self.num_items = ds.num_items
        self.model = build_model(cfg, ds.num_users, ds.num_items)
        self.params = params
        # default scoring slot: "now" = one past the last slot, so the full
        # history is visible (no leakage concern at serving time)
        self.slot = ds.graph.num_slots if slot is None else slot

        @jax.jit
        def _score_cand(params, graph, users, cand, slots):
            mb = gather_candidate_batch(graph, users, cand, slots)
            return self.model.apply({"params": params}, mb,
                                    method=self.model.score_candidates)

        self._score_cand = _score_cand

    @classmethod
    def from_checkpoint(cls, cfg: Config, ds: Dataset, ckpt_dir: str,
                        which: str = "best") -> "ScoringService":
        import jax

        from .checkpoint import CheckpointManager
        from .graph import device_graph
        from .train import init_state

        graph = device_graph(ds.graph)
        model = build_model(cfg, ds.num_users, ds.num_items)
        state = init_state(cfg, model, graph, jax.random.PRNGKey(0))
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore(which, state)
        if restored is None:
            raise FileNotFoundError(f"no '{which}' checkpoint in {ckpt_dir}")
        return cls(cfg, ds, restored["params"])

    def score(self, user_id: int, item_ids: Sequence[int]) -> np.ndarray:
        """Pointwise scores for one user against a candidate list.

        Runs in candidates form (R=1): the user history tower is computed
        ONCE for the request, not once per candidate — at full-catalog
        candidate counts this is the difference between one and ~10^5 GRU
        passes (ScoreModel.score_candidates; SURVEY.md §3.4)."""
        items = np.asarray(item_ids, np.int32)
        return self.score_batch(np.asarray([user_id], np.int32),
                                items[None, :])[0]

    def score_batch(self, user_ids: Sequence[int],
                    item_ids) -> np.ndarray:
        """Scores for R independent requests in ONE dispatch.

        `user_ids`: [R]; `item_ids`: [R, n] (one candidate list per user).
        Returns [R, n]. This is the serving-throughput path: the per-call
        relay dispatch RTT (~25 ms on this sandbox, CLAUDE.md) amortizes
        over R requests, and the candidates form computes each user's
        history tower once — not once per candidate (SURVEY.md §3.4).
        """
        users = np.asarray(user_ids, np.int32)
        items = np.asarray(item_ids, np.int32)
        if items.ndim != 2 or items.shape[0] != users.size:
            raise ValueError(
                f"item_ids must be [R, n] with R == len(user_ids); got "
                f"{items.shape} vs R={users.size}")
        r, n = items.shape
        rb, nb = _bucket(r), _bucket(n)
        pu = np.zeros(rb, np.int32)
        pu[:r] = users
        pi = np.zeros((rb, nb), np.int32)
        pi[:r, :n] = items
        slots = np.full(rb, self.slot, np.int32)
        out = self._score_cand(self.params, self.graph, jnp.asarray(pu),
                               jnp.asarray(pi), jnp.asarray(slots))
        return np.asarray(out)[:r, :n]

    def topk(self, user_id: int, k: int = 10,
             candidates: Optional[Sequence[int]] = None
             ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k items for a user over `candidates` (default: full catalog)."""
        if candidates is None:
            candidates = np.arange(1, self.num_items + 1, dtype=np.int32)
        else:
            candidates = np.asarray(candidates, np.int32)
        scores = self.score(user_id, candidates)
        order = np.argsort(-scores)[:k]
        return candidates[order], scores[order]
