"""Checkpoint/resume (SURVEY.md §5): orbax save/restore round-trip, resume
continues exactly, best/latest retention."""

import jax
import jax.numpy as jnp
import numpy as np

from score_tpu.checkpoint import CheckpointManager, apply_restore
from score_tpu.config import configs0
from score_tpu.graph import device_graph
from score_tpu.train import build_model, init_state, make_train_step, train


def _setup(tiny_dataset):
    cfg = configs0()
    g = device_graph(tiny_dataset.graph)
    model = build_model(cfg, tiny_dataset.num_users, tiny_dataset.num_items)
    state = init_state(cfg, model, g, jax.random.PRNGKey(0))
    return cfg, g, model, state


def test_save_restore_roundtrip(tiny_dataset, tmp_path):
    cfg, g, model, state = _setup(tiny_dataset)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save("latest", state, (2, 7), 0.81, 123)
    restored = mgr.restore("latest", state)
    assert restored is not None
    assert int(restored["step"]) == 123
    assert (int(restored["it_epoch"]), int(restored["it_pos"])) == (2, 7)
    np.testing.assert_allclose(float(restored["best_val"]), 0.81)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_restore_missing_returns_none(tiny_dataset, tmp_path):
    cfg, g, model, state = _setup(tiny_dataset)
    mgr = CheckpointManager(str(tmp_path / "empty"))
    assert mgr.restore("latest", state) is None
    assert not mgr.has("best")


def test_resume_continues_exactly(tiny_dataset, tmp_path):
    """Train K steps, checkpoint, train K more; vs restore + K more: params
    must match bit-for-bit (deterministic iterator + rng folding)."""
    cfg, g, model, state = _setup(tiny_dataset)
    step_fn = make_train_step(model, cfg)
    rng = jax.random.PRNGKey(0)
    from score_tpu.data.pipeline import TargetIterator

    def drive(state, it, k):
        for _ in range(k):
            b = next(it)
            state, _ = step_fn(
                state, g, {kk: jnp.asarray(v) for kk, v in b.items()}, rng)
        return state

    it = TargetIterator(tiny_dataset.train, 64, seed=0)
    state = drive(state, it, 5)
    mgr = CheckpointManager(str(tmp_path / "resume"))
    mgr.save("latest", state, it.get_state(), 0.5, 5)
    cont = drive(state, it, 5)

    # fresh process simulation: new state template, restore, same 5 steps
    state2 = init_state(cfg, model, g, jax.random.PRNGKey(1))  # diff init
    restored = mgr.restore("latest", state2)
    state2 = apply_restore(state2, restored)
    it2 = TargetIterator(tiny_dataset.train, 64, seed=0)
    it2.set_state((int(restored["it_epoch"]), int(restored["it_pos"])))
    cont2 = drive(state2, it2, 5)

    for a, b in zip(jax.tree_util.tree_leaves(cont.params),
                    jax.tree_util.tree_leaves(cont2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_with_checkpointing(tiny_dataset, tmp_path):
    """Driver-integrated: train writes latest+best; resumed run starts from
    the saved step."""
    cfg = configs0()
    tc = cfg.train.__class__(batch_size=64, num_epochs=1,
                             eval_every_steps=30, early_stop_patience=100,
                             log_every_steps=10 ** 9,
                             checkpoint_dir=str(tmp_path / "run"))
    cfg = cfg.replace(train=tc)
    out = train(cfg, tiny_dataset, verbose=False)
    from score_tpu.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "run"))
    assert mgr.has("latest") and mgr.has("best")
    # resume: runs remaining steps (none or few) without error
    out2 = train(cfg, tiny_dataset, verbose=False)
    assert out2["steps_run"] >= out["steps_run"] - 1


def test_cost_summary_and_timed():
    from score_tpu.profiling import cost_summary, timed
    f = lambda x: (x @ x).sum()
    x = jnp.ones((64, 64))
    cs = cost_summary(f, x)
    assert cs["flops"] > 0
    t = timed(jax.jit(f), x)
    assert t >= 0.0
