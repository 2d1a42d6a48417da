"""Pipeline iterator: determinism, resume, eval padding (SURVEY.md §4.2)."""

import numpy as np
import pytest

from score_tpu.data.pipeline import TargetIterator, eval_index_batches


def test_iterator_covers_epoch(tiny_dataset):
    it = TargetIterator(tiny_dataset.train, batch_size=64, seed=0)
    seen = []
    for _ in range(it.steps_per_epoch):
        seen.append(next(it)["user"])
    # one epoch touches steps*batch distinct positions (a permutation prefix)
    n = it.steps_per_epoch * 64
    assert sum(len(s) for s in seen) == n
    assert it.epoch == 0


def test_iterator_deterministic(tiny_dataset):
    a = TargetIterator(tiny_dataset.train, batch_size=32, seed=5)
    b = TargetIterator(tiny_dataset.train, batch_size=32, seed=5)
    for _ in range(10):
        ba, bb = next(a), next(b)
        np.testing.assert_array_equal(ba["user"], bb["user"])
        np.testing.assert_array_equal(ba["item"], bb["item"])


def test_iterator_seed_changes_order(tiny_dataset):
    a = TargetIterator(tiny_dataset.train, batch_size=32, seed=1)
    b = TargetIterator(tiny_dataset.train, batch_size=32, seed=2)
    assert not np.array_equal(next(a)["user"], next(b)["user"])


def test_iterator_resume(tiny_dataset):
    it = TargetIterator(tiny_dataset.train, batch_size=32, seed=0)
    for _ in range(7):
        next(it)
    state = it.get_state()
    want = [next(it) for _ in range(5)]
    it2 = TargetIterator(tiny_dataset.train, batch_size=32, seed=0)
    it2.set_state(state)
    got = [next(it2) for _ in range(5)]
    for w, g in zip(want, got):
        np.testing.assert_array_equal(w["user"], g["user"])
        np.testing.assert_array_equal(w["slot"], g["slot"])


def test_iterator_epoch_reshuffles(tiny_dataset):
    it = TargetIterator(tiny_dataset.train, batch_size=64, seed=0)
    first_epoch_first = next(it)["user"].copy()
    # exhaust epoch 0
    for _ in range(it.steps_per_epoch - 1):
        next(it)
    second_epoch_first = next(it)["user"]
    assert it.epoch == 1
    assert not np.array_equal(first_epoch_first, second_epoch_first)


def test_batch_size_too_large(tiny_dataset):
    with pytest.raises(ValueError):
        TargetIterator(tiny_dataset.val, batch_size=10 ** 9)


def test_eval_index_batches_contract(tiny_dataset):
    """eval_index_batches is the single owner of eval tail-padding (used by
    train.evaluate): fixed width, clamp-to-last-row padding, 0/1 weights
    covering exactly n rows in order."""
    n = len(tiny_dataset.val)
    bs = 50
    all_idx, total_w = [], 0.0
    for idx, w in eval_index_batches(n, bs):
        assert idx.shape == (bs,) and w.shape == (bs,)
        assert (idx[w == 0] == n - 1).all()      # padding repeats last row
        all_idx.append(idx[w == 1])
        total_w += w.sum()
    assert total_w == n
    np.testing.assert_array_equal(np.concatenate(all_idx), np.arange(n))
