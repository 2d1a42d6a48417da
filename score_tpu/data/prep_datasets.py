"""Per-dataset preprocessing entry points: CCMR / Taobao / Tmall.

Mirrors the reference's per-dataset preprocess scripts (SURVEY.md §2.3 #1-3;
reference mount is empty, so schemas follow the public dataset releases):

  * CCMR (Douban-derived movie ratings): user_id,item_id,rating,timestamp.
    Slots: equal-width buckets over the log's time range.
  * Taobao UserBehavior (Nov 25 - Dec 3 2017 click log): slots ~ days.
  * Tmall IJCAI-15: slots ~ half-months.

Each `prep_*` reads the raw CSV if present, else synthesizes a
schema-identical log (offline sandbox — SURVEY.md §7.0), then runs the shared
`build_dataset` pipeline.

CLI:  python -m score_tpu.data.prep_datasets <ccmr|taobao|tmall> <out_dir>
          [raw_path] [key=value ...]
"""

from __future__ import annotations

import os
import sys

import numpy as np

from . import synth
from .prep_common import build_dataset
from .schema import Dataset, save_dataset

_DEFAULTS = {
    # dataset: (num_slots, user_fanout, item_fanout, min_user, min_item)
    "ccmr": dict(num_slots=12, user_fanout=10, item_fanout=10,
                 min_user=5, min_item=5),
    "taobao": dict(num_slots=9, user_fanout=10, item_fanout=10,
                   min_user=5, min_item=5),
    "tmall": dict(num_slots=12, user_fanout=10, item_fanout=10,
                  min_user=5, min_item=5),
}


def _read_csv_cols(path: str, usecols, dtype=np.int64,
                   chunk_rows: int = 4_000_000) -> list[np.ndarray]:
    """Chunked columnar CSV reader (VERDICT.md r1 #8: np.loadtxt is a pure
    Python row loop and would not survive Taobao-scale ~1e8-event logs).
    pandas' C engine streams `chunk_rows` at a time so peak memory is the
    packed output + one chunk."""
    import pandas as pd
    cols = list(usecols)
    parts = []
    for chunk in pd.read_csv(path, usecols=cols, dtype=dtype,
                             chunksize=chunk_rows, engine="c"):
        parts.append(chunk.to_numpy(dtype=dtype))
    data = parts[0] if len(parts) == 1 else np.concatenate(parts, axis=0)
    # pandas returns columns in file order; map back to the requested order
    order = np.argsort(np.argsort(cols))
    return [data[:, order[k]] for k in range(len(cols))]


def _load_or_synth(dataset: str, raw_path: str | None, usecols,
                   synth_kw) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    if raw_path is None or not os.path.exists(raw_path):
        raw_path = raw_path or f"/tmp/score_tpu_raw/{dataset}.csv"
        if not os.path.exists(raw_path):
            synth.write_raw(dataset, raw_path, **synth_kw)
    return tuple(_read_csv_cols(raw_path, usecols))


def prep_ccmr(out_dir: str, raw_path: str | None = None, seed: int = 0,
              synth_kw: dict | None = None, **overrides) -> Dataset:
    kw = dict(_DEFAULTS["ccmr"], **overrides)
    user, item, ts = _load_or_synth(
        "ccmr", raw_path, usecols=(0, 1, 3),
        synth_kw=dict(synth_kw or {}, num_slots=kw["num_slots"], seed=seed))
    ds = build_dataset(user, item, ts, dataset_name="ccmr", seed=seed, **kw)
    save_dataset(ds, out_dir)
    return ds


def prep_taobao(out_dir: str, raw_path: str | None = None, seed: int = 0,
                synth_kw: dict | None = None, **overrides) -> Dataset:
    kw = dict(_DEFAULTS["taobao"], **overrides)
    user, item, ts = _load_or_synth(
        "taobao", raw_path, usecols=(0, 1, 4),
        synth_kw=dict(synth_kw or {}, num_slots=kw["num_slots"], seed=seed))
    ds = build_dataset(user, item, ts, dataset_name="taobao", seed=seed, **kw)
    save_dataset(ds, out_dir)
    return ds


def prep_tmall(out_dir: str, raw_path: str | None = None, seed: int = 0,
               synth_kw: dict | None = None, **overrides) -> Dataset:
    kw = dict(_DEFAULTS["tmall"], **overrides)
    user, item, ts = _load_or_synth(
        "tmall", raw_path, usecols=(0, 1, 5),
        synth_kw=dict(synth_kw or {}, num_slots=kw["num_slots"], seed=seed))
    ds = build_dataset(user, item, ts, dataset_name="tmall", seed=seed, **kw)
    save_dataset(ds, out_dir)
    return ds


PREP = {"ccmr": prep_ccmr, "taobao": prep_taobao, "tmall": prep_tmall}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) < 2 or argv[0] not in PREP:
        print(__doc__)
        raise SystemExit(2)
    dataset, out_dir = argv[0], argv[1]
    raw_path = None
    overrides = {}
    for a in argv[2:]:
        if "=" in a:
            k, v = a.split("=", 1)
            overrides[k] = int(v)
        else:
            raw_path = a
    ds = PREP[dataset](out_dir, raw_path=raw_path, **overrides)
    print(f"{dataset}: users={ds.num_users} items={ds.num_items} "
          f"slots={ds.graph.num_slots} train={len(ds.train)} "
          f"val={len(ds.val)} test={len(ds.test)} -> {out_dir}")


if __name__ == "__main__":
    main()
