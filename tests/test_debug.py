"""Sanitizers (SURVEY.md §5): bounds checks + checkified lookup."""

import jax.numpy as jnp
import numpy as np
import pytest

from score_tpu.debug import check_batch_bounds, checked_lookup


def test_check_batch_bounds_ok():
    check_batch_bounds(dict(user=np.array([1, 2]), item=np.array([3]),
                            u_hist=np.array([[0, 1]]),
                            i_hist=np.array([[2]])),
                       num_users=5, num_items=5)


def test_check_batch_bounds_rejects():
    with pytest.raises(ValueError, match="item"):
        check_batch_bounds(dict(item=np.array([7])), 5, 5)
    with pytest.raises(ValueError, match="i_hist"):
        check_batch_bounds(dict(i_hist=np.array([-1])), 5, 5)


def test_checked_lookup():
    table = jnp.ones((4, 3))
    err, rows = checked_lookup(table, jnp.asarray([0, 3]))
    err.throw()  # no error
    assert rows.shape == (2, 3)
    err, _ = checked_lookup(table, jnp.asarray([0, 4]))
    with pytest.raises(Exception, match="beyond table rows"):
        err.throw()


def test_gauc_metric(rng):
    from score_tpu.metrics import ranking_metrics
    pos = jnp.asarray(np.full(8, 10.0, np.float32))
    neg = jnp.asarray(rng.normal(size=(8, 20)).astype(np.float32))
    out = ranking_metrics(pos, neg)
    assert float(out["gauc"]) == 1.0          # positive above all negatives
    pos2 = jnp.asarray(np.full(8, -10.0, np.float32))
    out2 = ranking_metrics(pos2, neg)
    assert float(out2["gauc"]) == 0.0
