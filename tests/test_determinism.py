"""Determinism and reproducibility (SURVEY §4: determinism hygiene is the
reference's only reproducibility story; ours is testable)."""
import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from uaps_tpu.data.synthetic import SyntheticDefects
from uaps_tpu.methods import get_method, base as mbase
from uaps_tpu.utils.config import preset


def _cfg():
    cfg = preset("synthetic", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                   batch_size=4)
    return cfg


def _train_n(seed, n=3):
    cfg = _cfg()
    method = get_method("uaps")
    state, model = method.init_state(cfg, jax.random.key(seed))
    tx = mbase.make_optimizer(cfg.optim)
    step = jax.jit(method.make_train_step(cfg, model, tx))
    data = SyntheticDefects(cfg.data, seed=0)
    stream = data.train_iter()
    for _ in range(n):
        state, metrics = step(state, next(stream))
    return jax.device_get(state.params), float(metrics["loss"])


def test_same_seed_bitwise_reproducible():
    p1, l1 = _train_n(7)
    p2, l2 = _train_n(7)
    assert l1 == l2
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(a, b)


def test_different_seed_differs():
    _, l1 = _train_n(7)
    _, l2 = _train_n(8)
    assert l1 != l2


def test_synthetic_data_reproducible():
    cfg = _cfg()
    a = next(iter(SyntheticDefects(cfg.data, seed=3).train_iter()))
    b = next(iter(SyntheticDefects(cfg.data, seed=3).train_iter()))
    np.testing.assert_array_equal(a["image"], b["image"])
    np.testing.assert_array_equal(a["label"], b["label"])
