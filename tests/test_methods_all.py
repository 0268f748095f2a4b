"""Single-step mechanics for every comparison method + method-specific
semantics (EMA motion, MT gating, CPS dual update, UCC cutmix)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uaps_tpu.data.synthetic import SyntheticDefects
from uaps_tpu.methods import get_method, base as mbase, METHODS
from uaps_tpu.utils.config import preset


def tiny_cfg(method):
    cfg = preset("synthetic", method=method)
    cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                   batch_size=4)
    return cfg


def setup(method_name):
    cfg = tiny_cfg(method_name)
    method = get_method(method_name)
    state, model = method.init_state(cfg, jax.random.key(0))
    tx = mbase.make_optimizer(cfg.optim)
    step = jax.jit(method.make_train_step(cfg, model, tx))
    data = SyntheticDefects(cfg.data, seed=0)
    if method_name == "ucc":
        batch = next(iter(data.train_iter_weak_strong()))
    else:
        batch = next(iter(data.train_iter()))
    return cfg, method, model, state, step, batch


@pytest.mark.parametrize("method_name", list(METHODS))
def test_every_method_single_step(method_name):
    cfg, method, model, state, step, batch = setup(method_name)
    new_state, metrics = step(state, batch)
    assert int(new_state.step) == 1
    assert np.isfinite(float(metrics["loss"])), method_name
    p0 = jax.tree.leaves(state.params)[0]
    p1 = jax.tree.leaves(new_state.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1)), method_name
    # eval protocol works for every method's model
    ev = mbase.make_eval_step(cfg, model)
    m = ev(new_state.params, new_state.batch_stats,
           {"image": batch["image"], "label": batch["label"]})
    assert np.isfinite(float(m["val_mdice"])), method_name


class TestMT:
    def test_consistency_gated_early(self):
        _, _, _, state, step, batch = setup("mt")
        _, metrics = step(state, batch)  # step 0 < 1000
        assert float(metrics["consistency_loss"]) == 0.0
        late = state.replace(step=jnp.asarray(2000, jnp.int32))
        _, metrics = step(late, batch)
        assert float(metrics["consistency_loss"]) > 0.0

    def test_ema_tracks_student(self):
        _, _, _, state, step, batch = setup("mt")
        # at step 0, alpha = min(1 - 1/1, decay) = 0 -> ema == new student
        new_state, _ = step(state, batch)
        ema = jax.tree.leaves(new_state.ema_params)[0]
        stu = jax.tree.leaves(new_state.params)[0]
        np.testing.assert_allclose(np.asarray(ema), np.asarray(stu),
                                   rtol=1e-6)
        # at a later step, ema moves but stays between old ema and student
        late = new_state.replace(step=jnp.asarray(100, jnp.int32))
        s2, _ = step(late, batch)
        ema2 = jax.tree.leaves(s2.ema_params)[0]
        assert not np.allclose(np.asarray(ema2), np.asarray(ema))


class TestUAMT:
    def test_uncertainty_metric(self):
        _, _, _, state, step, batch = setup("uamt")
        _, metrics = step(state, batch)
        assert float(metrics["mean_uncertainty"]) > 0.0
        # entropy of a C-class distribution bounded by log(C)
        assert float(metrics["mean_uncertainty"]) <= np.log(4) + 1e-5


class TestCPS:
    def test_both_models_update(self):
        _, _, _, state, step, batch = setup("cps")
        new_state, _ = step(state, batch)
        for old, new in [(state.params, new_state.params),
                         (state.second.params, new_state.second.params)]:
            a = jax.tree.leaves(old)[0]
            b = jax.tree.leaves(new)[0]
            assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_models_independently_initialized(self):
        _, _, _, state, _, _ = setup("cps")
        # compare conv kernels (the first tree leaf is a BN scale == ones
        # in both models); at least one weight tensor must differ
        diffs = [
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(state.params),
                            jax.tree.leaves(state.second.params))
            if a.ndim == 4
        ]
        assert any(diffs)


class TestCutmix:
    def test_cutout_mask_area(self):
        from uaps_tpu.ops.cutmix import cutout_mask
        m = np.asarray(cutout_mask(jax.random.key(0), 64, 64, ratio=2))
        zero_frac = (m == 0).mean()
        # area = H*W/ratio, up to rounding of h
        assert 0.35 < zero_frac < 0.65
        # rectangle: zero region is contiguous rows x cols
        rows = np.where((m == 0).any(axis=1))[0]
        cols = np.where((m == 0).any(axis=0))[0]
        assert (np.diff(rows) == 1).all() and (np.diff(cols) == 1).all()

    def test_mix_data_labels_follow_images(self):
        from uaps_tpu.ops.cutmix import generate_mix_data
        rng = np.random.default_rng(0)
        imgs = jnp.asarray(rng.standard_normal((4, 32, 32, 3)), jnp.float32)
        labs = jnp.asarray(rng.integers(0, 4, (4, 32, 32)), jnp.int32)
        mi, ml = generate_mix_data(jax.random.key(1), imgs, labs, p=1.0)
        assert mi.shape == imgs.shape and ml.shape == labs.shape
        # every label value still in range
        assert int(ml.min()) >= 0 and int(ml.max()) < 4
        # mixing happened somewhere
        assert not np.allclose(np.asarray(mi), np.asarray(imgs))

    def test_crossmix_shares_mask(self):
        from uaps_tpu.ops.cutmix import generate_crossmix_data
        lab = jnp.zeros((2, 16, 16, 3))
        wk = jnp.ones((2, 16, 16, 3))
        st = jnp.full((2, 16, 16, 3), 2.0)
        nwk, nst = generate_crossmix_data(jax.random.key(2), lab, wk, st,
                                          p=1.0)
        # pasted region (values from lab=0) must coincide in wk and st
        np.testing.assert_array_equal(np.asarray(nwk) == 0.0,
                                      np.asarray(nst) == 0.0)

    def test_p_zero_identity(self):
        from uaps_tpu.ops.cutmix import generate_mix_data
        imgs = jnp.ones((2, 16, 16, 3))
        labs = jnp.zeros((2, 16, 16), jnp.int32)
        mi, ml = generate_mix_data(jax.random.key(3), imgs, labs, p=0.0)
        np.testing.assert_array_equal(np.asarray(mi), np.asarray(imgs))
