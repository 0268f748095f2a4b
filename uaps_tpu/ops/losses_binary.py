"""Binary/sigmoid loss & score library (reference losses_2.py).

Pinned to /root/reference/utilities/losses_2.py: binary focal (:7-26),
functional iou/f_score with eps smoothing (:108-180), Jaccard/Dice losses
on sigmoid activations (:29-51), BCE combos (BCEJaccard = jaccard + bce
:53-63; BCEDice = 0.4 dice + 0.6 bce :81-91), super_loss (:185-196) and
the raw-probability kl_loss (:199-213).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy

from uaps_tpu.ops.losses import binary_cross_entropy_loss

Array = jax.Array


def _activate(pr: Array, activation: Optional[str]) -> Array:
    if activation in (None, "none"):
        return pr
    if activation == "sigmoid":
        return jax.nn.sigmoid(pr)
    if activation == "softmax2d":
        return jax.nn.softmax(pr, axis=-1)
    raise NotImplementedError(activation)


def iou_score(pr: Array, gt: Array, eps: float = 1e-7,
              threshold: Optional[float] = None,
              activation: str = "sigmoid") -> Array:
    """(I + eps) / (|gt| + |pr| - I + eps) over ALL elements (:108-139)."""
    pr = _activate(pr, activation)
    if threshold is not None:
        pr = (pr > threshold).astype(pr.dtype)
    gt = gt.astype(pr.dtype)
    intersection = jnp.sum(gt * pr)
    union = jnp.sum(gt) + jnp.sum(pr) - intersection + eps
    return (intersection + eps) / union


def f_score(pr: Array, gt: Array, beta: float = 1.0, eps: float = 1e-7,
            threshold: Optional[float] = None,
            activation: str = "sigmoid") -> Array:
    """F-beta over all elements (:145-180)."""
    pr = _activate(pr, activation)
    if threshold is not None:
        pr = (pr > threshold).astype(pr.dtype)
    gt = gt.astype(pr.dtype)
    tp = jnp.sum(gt * pr)
    fp = jnp.sum(pr) - tp
    fn = jnp.sum(gt) - tp
    b2 = beta ** 2
    return ((1 + b2) * tp + eps) / ((1 + b2) * tp + b2 * fn + fp + eps)


def binary_focal_loss(logits_or_probs: Array, targets: Array,
                      alpha: float = 0.8, gamma: float = 2.0,
                      logits: bool = False, reduce: bool = True) -> Array:
    """alpha (1 - exp(-BCE))^gamma * BCE (:7-26)."""
    targets = targets.astype(jnp.float32)
    if logits:
        x = logits_or_probs
        bce = jnp.maximum(x, 0) - x * targets + jnp.log1p(jnp.exp(-jnp.abs(x)))
    else:
        p = jnp.clip(logits_or_probs, 1e-7, 1 - 1e-7)
        bce = -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
    pt = jnp.exp(-bce)
    loss = alpha * (1 - pt) ** gamma * bce
    return jnp.mean(loss) if reduce else loss


def jaccard_loss_sigmoid(logits: Array, targets: Array,
                         eps: float = 1e-7) -> Array:
    """1 - iou(sigmoid(logits), targets) (:29-38)."""
    return 1.0 - iou_score(logits, targets, eps=eps, activation="sigmoid")


def dice_loss_sigmoid(logits: Array, targets: Array,
                      eps: float = 1e-7) -> Array:
    """1 - f1(sigmoid(logits), targets) (:41-50)."""
    return 1.0 - f_score(logits, targets, beta=1.0, eps=eps,
                         activation="sigmoid")


def bce_jaccard_loss(logits: Array, targets: Array,
                     eps: float = 1e-7) -> Array:
    """jaccard + BCE-with-logits (:53-63)."""
    return jaccard_loss_sigmoid(logits, targets, eps) \
        + binary_cross_entropy_loss(logits, targets)


def bce_dice_loss(logits: Array, targets: Array, eps: float = 1e-7) -> Array:
    """0.4 dice + 0.6 BCE-with-logits (:81-91) — the reference's
    loss_calc."""
    return 0.4 * dice_loss_sigmoid(logits, targets, eps) \
        + 0.6 * binary_cross_entropy_loss(logits, targets)


def super_loss(logit_s1: Array, logit_s2: Array, labels_s1: Array,
               labels_s2: Array) -> Array:
    """bce_dice(s1) + bce_dice(s2) (:185-189)."""
    return bce_dice_loss(logit_s1, labels_s1) \
        + bce_dice_loss(logit_s2, labels_s2)


def kl_loss(pr: Array, gt: Array) -> Array:
    """F.kl_div(log(pr), gt, 'mean') on raw probabilities (:199-213)."""
    return jnp.mean(xlogy(gt, gt) - gt * jnp.log(jnp.clip(pr, 1e-30)))
