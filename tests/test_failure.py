"""Failure detection + rollback guard (SURVEY §5.3 — absent in the
reference; first-class here)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from otto_tpu.utils.checkpoint import CheckpointManager
from otto_tpu.utils.failure import TrainingGuard, nonfinite_count


def test_nonfinite_count():
    clean = {"a": jnp.ones((3, 3)), "b": {"c": jnp.zeros(5), "i": jnp.arange(4)}}
    assert int(nonfinite_count(clean)) == 0
    dirty = {"a": jnp.array([1.0, jnp.nan, jnp.inf]), "b": jnp.ones(2)}
    assert int(nonfinite_count(dirty)) == 2


def _toy_step(params, x):
    # scalar quadratic: params converge toward x
    loss, g = jax.value_and_grad(lambda p: jnp.sum((p["w"] - x) ** 2))(params)
    return {"w": params["w"] - 0.1 * g["w"]}, loss


def test_guard_rolls_back_on_nan(tmp_path):
    mgr = CheckpointManager(tmp_path / "g")
    guard = TrainingGuard(mgr, save_every=5, max_rollbacks=2)
    params = {"w": jnp.zeros(4)}
    params, step = guard.resume(params)
    assert step == 0

    poisoned = {17}  # first visit to step 17 produces a NaN loss
    seen_bad = False
    while step < 30:
        step += 1
        new_params, loss = _toy_step(params, jnp.float32(1.0))
        if step in poisoned:
            poisoned.discard(step)
            loss = jnp.float32(np.nan)
        params, step, ok = guard.observe(step, new_params, loss)
        if not ok:
            seen_bad = True
            assert step == 15  # rewound to the last multiple of save_every
    assert seen_bad
    assert guard.rollbacks == 1
    assert guard.failures[0]["step"] == 17
    np.testing.assert_allclose(np.asarray(params["w"]), 1.0, atol=1e-2)
    mgr.close()


def test_guard_raises_without_checkpoint(tmp_path):
    mgr = CheckpointManager(tmp_path / "g2")
    guard = TrainingGuard(mgr, save_every=5)
    with pytest.raises(RuntimeError, match="no\n?.*checkpoint|no "):
        guard.observe(1, {"w": jnp.zeros(2)}, jnp.float32(np.nan))
    mgr.close()


def test_guard_gives_up_after_max_rollbacks(tmp_path):
    mgr = CheckpointManager(tmp_path / "g3")
    guard = TrainingGuard(mgr, save_every=1, max_rollbacks=2)
    params = {"w": jnp.ones(2)}
    params, step, ok = guard.observe(1, params, jnp.float32(0.5))  # checkpoint
    assert ok
    for i in range(2):
        params, step, ok = guard.observe(2 + i, params, jnp.float32(np.nan))
        assert not ok and step == 1
    with pytest.raises(RuntimeError, match="exceeded"):
        guard.observe(5, params, jnp.float32(np.nan))
    mgr.close()


def test_guard_resume_after_crash(tmp_path):
    """A fresh guard over the same directory resumes from the last
    checkpoint — the elastic-restart path."""
    mgr = CheckpointManager(tmp_path / "g4")
    guard = TrainingGuard(mgr, save_every=2)
    params = {"w": jnp.zeros(3)}
    step = 0
    while step < 6:
        step += 1
        params, loss = _toy_step(params, jnp.float32(2.0))
        params, step, _ = guard.observe(step, params, loss)
    saved_w = np.asarray(params["w"])
    mgr.close()

    # "crash": new process = new manager + guard, same directory
    mgr2 = CheckpointManager(tmp_path / "g4")
    guard2 = TrainingGuard(mgr2, save_every=2)
    fresh = {"w": jnp.zeros(3)}
    restored, step = guard2.resume(fresh)
    assert step == 6
    np.testing.assert_array_equal(np.asarray(restored["w"]), saved_w)
    mgr2.close()
