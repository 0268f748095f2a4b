"""Metric semantics pinned against the reference's formulas.

The reference (utilities/metrics.py) loops classes 1..C-1, yields NaN for
classes absent from the label, and nanmeans. We re-derive expected values
with a plain-numpy transliteration of those formulas here (not vectorized,
so a genuine independent check of our one-hot-count implementation).
"""
import numpy as np
import jax.numpy as jnp

from uaps_tpu.ops import metrics

import pytest

pytestmark = pytest.mark.fast


def _np_miou(pred, mask, n_classes, smooth=1e-10):
    vals = []
    for c in range(1, n_classes):
        tc, tl = pred == c, mask == c
        if tl.sum() == 0:
            vals.append(np.nan)
        else:
            i = np.logical_and(tc, tl).sum()
            u = np.logical_or(tc, tl).sum()
            vals.append((i + smooth) / (u + smooth))
    return np.nanmean(vals)


def _np_mdice(pred, mask, n_classes, smooth=1e-10):
    vals = []
    for c in range(1, n_classes):
        tc, tl = pred == c, mask == c
        if tl.sum() == 0:
            vals.append(np.nan)
        else:
            i = np.logical_and(tc, tl).sum()
            u = np.logical_or(tc, tl).sum()
            vals.append(2 * (i + smooth) / (u + i + smooth))
    return np.nanmean(vals)


def _rand_case(rng, n_classes=4, all_classes=True):
    logits = rng.standard_normal((2, 32, 32, n_classes)).astype(np.float32)
    labels = rng.integers(0, n_classes, size=(2, 32, 32)).astype(np.int32)
    if not all_classes:
        labels[labels == 2] = 0  # class 2 absent -> NaN path
    return logits, labels


class TestMetrics:
    def test_miou_matches_reference_formula(self, rng):
        logits, labels = _rand_case(rng)
        pred = np.argmax(logits, axis=-1)
        ours = float(metrics.mean_iou(jnp.asarray(logits), jnp.asarray(labels), 4))
        np.testing.assert_allclose(ours, _np_miou(pred, labels, 4), rtol=1e-6)

    def test_mdice_matches_reference_formula(self, rng):
        logits, labels = _rand_case(rng)
        pred = np.argmax(logits, axis=-1)
        ours = float(metrics.mean_dice(jnp.asarray(logits), jnp.asarray(labels), 4))
        np.testing.assert_allclose(ours, _np_mdice(pred, labels, 4), rtol=1e-6)

    def test_absent_class_nan_semantics(self, rng):
        logits, labels = _rand_case(rng, all_classes=False)
        pred = np.argmax(logits, axis=-1)
        ours = float(metrics.mean_iou(jnp.asarray(logits), jnp.asarray(labels), 4))
        np.testing.assert_allclose(ours, _np_miou(pred, labels, 4), rtol=1e-6)

    def test_pixel_accuracy(self, rng):
        logits, labels = _rand_case(rng)
        pred = np.argmax(logits, axis=-1)
        ours = float(metrics.pixel_accuracy(jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(ours, (pred == labels).mean(), rtol=1e-6)

    def test_perfect_prediction(self):
        labels = np.tile(np.arange(4, dtype=np.int32), (1, 16, 4)).reshape(1, 16, 16)
        logits = np.eye(4, dtype=np.float32)[labels] * 10.0
        m = metrics.segmentation_metrics(jnp.asarray(logits), jnp.asarray(labels), 4)
        assert float(m["miou"]) > 0.999
        assert float(m["mdice"]) > 0.999
        assert float(m["pixel_acc"]) == 1.0

    def test_combined_matches_individual(self, rng):
        logits, labels = _rand_case(rng)
        m = metrics.segmentation_metrics(jnp.asarray(logits), jnp.asarray(labels), 4)
        np.testing.assert_allclose(
            float(m["miou"]),
            float(metrics.mean_iou(jnp.asarray(logits), jnp.asarray(labels), 4)),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(m["mdice"]),
            float(metrics.mean_dice(jnp.asarray(logits), jnp.asarray(labels), 4)),
            rtol=1e-6,
        )


class TestRamps:
    def test_sigmoid_rampup_endpoints(self):
        from uaps_tpu.ops import ramps
        np.testing.assert_allclose(float(ramps.sigmoid_rampup(0, 200)), np.exp(-5.0), rtol=1e-5)
        np.testing.assert_allclose(float(ramps.sigmoid_rampup(200, 200)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(ramps.sigmoid_rampup(500, 200)), 1.0, rtol=1e-6)
        assert float(ramps.sigmoid_rampup(5, 0)) == 1.0

    def test_sigmoid_rampup_matches_reference_formula(self):
        from uaps_tpu.ops import ramps
        for cur in [0, 10, 50, 100, 199]:
            phase = 1.0 - np.clip(cur, 0, 200) / 200.0
            expected = float(np.exp(-5.0 * phase * phase))
            np.testing.assert_allclose(
                float(ramps.sigmoid_rampup(cur, 200.0)), expected, rtol=1e-5
            )

    def test_linear_and_cosine(self):
        from uaps_tpu.ops import ramps
        assert float(ramps.linear_rampup(50, 100)) == 0.5
        assert float(ramps.linear_rampup(200, 100)) == 1.0
        np.testing.assert_allclose(float(ramps.cosine_rampdown(0, 100)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(ramps.cosine_rampdown(100, 100)), 0.0, atol=1e-6)
