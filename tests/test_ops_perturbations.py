"""Perturbation semantics: statistical + structural properties.

Randomness can't be bit-matched across frameworks, so we verify the
*distributional contract* of each perturbation against the reference
definitions (UAPS_unet.py:156-185).
"""
import numpy as np
import jax
import jax.numpy as jnp

from uaps_tpu.ops import perturbations as P

import pytest

pytestmark = pytest.mark.fast


def _feat(rng, b=3, h=16, w=16, c=8):
    return jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))


class TestFeatureNoise:
    def test_ratio_bounded(self, rng):
        x = jnp.abs(_feat(rng)) + 0.1
        out = P.feature_noise(jax.random.key(0), x, uniform_range=0.3)
        ratio = np.asarray(out / x)
        assert ratio.min() >= 0.7 - 1e-5 and ratio.max() <= 1.3 + 1e-5

    def test_noise_shared_across_batch(self, rng):
        x = jnp.ones((4, 8, 8, 2))
        out = np.asarray(P.feature_noise(jax.random.key(1), x))
        # identical multiplicative field for every example
        np.testing.assert_allclose(out[0], out[1])
        np.testing.assert_allclose(out[0], out[3])
        # but varying across positions
        assert np.std(out[0]) > 0.01


class TestDropout:
    def test_rate_and_scaling(self, rng):
        x = jnp.ones((2, 64, 64, 16))
        out = np.asarray(P.dropout(jax.random.key(2), x, rate=0.5))
        zero_frac = (out == 0).mean()
        assert abs(zero_frac - 0.5) < 0.02
        nz = out[out != 0]
        np.testing.assert_allclose(nz, 2.0, rtol=1e-6)  # 1/(1-p) scaling


class TestFeatureDropout:
    def test_drops_high_attention_regions(self, rng):
        x = np.zeros((1, 8, 8, 4), np.float32)
        x[0, :2, :2, :] = 10.0   # hot region = high channel-mean attention
        x[0, 4:, 4:, :] = 0.1
        out = np.asarray(P.feature_dropout(jax.random.key(3), x))
        assert np.all(out[0, :2, :2, :] == 0)      # hot region zeroed
        assert np.all(out[0, 4:, 4:, :] == x[0, 4:, 4:, :])  # cool kept

    def test_threshold_scalar_shared(self, rng):
        # With identical examples, the kept/dropped pattern must be identical
        one = rng.standard_normal((1, 16, 16, 4)).astype(np.float32)
        x = jnp.asarray(np.concatenate([one, one], axis=0))
        out = np.asarray(P.feature_dropout(jax.random.key(4), x))
        np.testing.assert_allclose(out[0], out[1])

    def test_per_example_max(self, rng):
        # Examples with different scales get different absolute thresholds
        a = np.abs(rng.standard_normal((1, 8, 8, 4))).astype(np.float32)
        b = (a * 100.0).astype(np.float32)
        x = jnp.asarray(np.concatenate([a, b], axis=0))
        out = np.asarray(P.feature_dropout(jax.random.key(5), x))
        # masks should be identical since threshold scales with each example's max
        np.testing.assert_allclose((out[0] == 0), (out[1] == 0))


class TestPerturbAll:
    def test_applies_to_each_skip(self, rng):
        feats = [_feat(rng, c=2 ** (4 + i), h=32 >> i, w=32 >> i) for i in range(3)]
        for kind in P.PERTURBATIONS:
            out = P.perturb_features(jax.random.key(6), feats, kind)
            assert len(out) == 3
            for o, f in zip(out, feats):
                assert o.shape == f.shape
                assert not np.allclose(np.asarray(o), np.asarray(f))

    def test_none_identity(self, rng):
        feats = [_feat(rng)]
        out = P.perturb_features(jax.random.key(7), feats, "none")
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(feats[0]))

    def test_jittable(self, rng):
        x = _feat(rng)
        f = jax.jit(lambda k, v: P.feature_dropout(k, v))
        out = f(jax.random.key(8), x)
        assert out.shape == x.shape
