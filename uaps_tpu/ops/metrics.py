"""On-device segmentation metrics.

Pinned to /root/reference/utilities/metrics.py:
  - argmax over softmax predictions
  - per-class loop starts at class 1 (background class 0 excluded)
  - a class absent from the LABEL contributes NaN; final value is nanmean
  - smooth = 1e-10 added to numerator and denominator

Unlike the reference (which does a python loop with .item() device syncs per
class per batch — a throughput bug noted in SURVEY.md §3.1), everything here
is a single vectorized on-device computation via one-hot count reduction, so
metrics can live inside the jitted train/eval step and only sync once per
logging interval.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def _class_counts(pred: Array, label: Array, n_classes: int):
    """Per-class (intersection, pred_count, label_count) via one-hot sums.

    pred/label: int arrays of identical shape (any rank).
    Returns three [n_classes] float32 vectors.
    """
    pred = pred.reshape(-1)
    label = label.reshape(-1)
    pred_oh = jax.nn.one_hot(pred, n_classes, dtype=jnp.float32)
    label_oh = jax.nn.one_hot(label, n_classes, dtype=jnp.float32)
    intersect = jnp.sum(pred_oh * label_oh, axis=0)
    pred_count = jnp.sum(pred_oh, axis=0)
    label_count = jnp.sum(label_oh, axis=0)
    return intersect, pred_count, label_count


def pixel_accuracy(logits: Array, label: Array) -> Array:
    """fraction of pixels where argmax(logits) == label (metrics.py:8-13)."""
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean((pred == label).astype(jnp.float32))


def per_class_iou(
    logits: Array, label: Array, n_classes: int, smooth: float = 1e-10
) -> Array:
    """[n_classes] IoU vector; NaN where the class is absent from `label`.

    Index 0 (background) is included here; mean_iou drops it.
    """
    pred = jnp.argmax(logits, axis=-1)
    intersect, pred_count, label_count = _class_counts(pred, label, n_classes)
    union = pred_count + label_count - intersect
    iou = (intersect + smooth) / (union + smooth)
    return jnp.where(label_count > 0, iou, jnp.nan)


def mean_iou(
    logits: Array, label: Array, n_classes: int, smooth: float = 1e-10
) -> Array:
    """nanmean of classes 1..C-1 IoU (metrics.py:16-37)."""
    iou = per_class_iou(logits, label, n_classes, smooth)
    return jnp.nanmean(iou[1:])


def mean_dice(
    logits: Array, label: Array, n_classes: int, smooth: float = 1e-10
) -> Array:
    """nanmean of classes 1..C-1 Dice (metrics.py:40-61).

    Reference formula: 2*(I + s) / (U + I + s) with U the logical-or count,
    i.e. denominator = pred_count + label_count + s.
    """
    pred = jnp.argmax(logits, axis=-1)
    intersect, pred_count, label_count = _class_counts(pred, label, n_classes)
    union = pred_count + label_count - intersect
    dice = 2.0 * (intersect + smooth) / (union + intersect + smooth)
    dice = jnp.where(label_count > 0, dice, jnp.nan)
    return jnp.nanmean(dice[1:])


def segmentation_metrics(
    logits: Array, label: Array, n_classes: int, smooth: float = 1e-10
) -> Dict[str, Array]:
    """All three metrics in one pass (shares the one-hot count reduction)."""
    pred = jnp.argmax(logits, axis=-1)
    intersect, pred_count, label_count = _class_counts(pred, label, n_classes)
    union = pred_count + label_count - intersect
    present = label_count > 0
    iou = jnp.where(present, (intersect + smooth) / (union + smooth), jnp.nan)
    dice = jnp.where(
        present,
        2.0 * (intersect + smooth) / (union + intersect + smooth),
        jnp.nan,
    )
    acc = jnp.mean((pred == label).astype(jnp.float32))
    return {
        "miou": jnp.nanmean(iou[1:]),
        "mdice": jnp.nanmean(dice[1:]),
        "pixel_acc": acc,
    }
