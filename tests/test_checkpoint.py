"""CheckpointManager unit tests: round-trip, keep-best, latest, host state.

The reference can only torch.save best-val weights and cannot resume
(UAPS_train.py:437-450, SURVEY.md §5.4); these tests pin the rebuild's
full-state step-indexed semantics.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uaps_tpu.utils.checkpoint import CheckpointManager

pytestmark = pytest.mark.fast


def _state(seed):
    k = jax.random.key(seed)
    return {
        "params": {"w": jax.random.normal(jax.random.fold_in(k, 0), (4, 3)),
                   "b": jnp.zeros((3,))},
        "step": jnp.asarray(seed, jnp.int32),
    }


def _abstract(state):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)


class TestCheckpointManager:
    def test_roundtrip_with_host_state(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
        s = _state(7)
        mgr.save(7, s, host_state={"best_dice": 0.5, "epoch": 3},
                 metrics={"val_mdice": 0.5})
        mgr.wait()
        restored, host = mgr.restore(_abstract(s))
        for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert host == {"best_dice": 0.5, "epoch": 3}
        mgr.close()

    def test_best_vs_latest_and_retention(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
        for step, dice in [(1, 0.3), (2, 0.9), (3, 0.6)]:
            mgr.save(step, _state(step), metrics={"val_mdice": dice})
        mgr.wait()
        assert mgr.latest_step() == 3
        assert mgr.best_step() == 2  # kept despite max_to_keep=2
        restored, _ = mgr.restore(_abstract(_state(0)), step=mgr.best_step())
        assert int(restored["step"]) == 2
        mgr.close()

    def test_empty_dir_restores_none(self, tmp_path):
        mgr = CheckpointManager(str(tmp_path / "empty"))
        restored, host = mgr.restore(_abstract(_state(0)))
        assert restored is None and host is None
        mgr.close()
