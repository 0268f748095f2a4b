"""Segmentation losses as pure jnp functions (NHWC, labels last-dim-free).

Semantics are pinned to the reference's three loss libraries:
  - dice/jaccard/tversky: /root/reference/utilities/pytorch_losses.py:54-175
  - softmax MSE/KL, symmetric MSE, focal, entropy, feature-sim:
    /root/reference/utilities/losses_1.py
  - weighted CE with ignore_index: /root/reference/utilities/pytorch_losses.py:31-51

Conventions (differ from the reference's NCHW):
  logits: float [..., C]   (usually [B, H, W, C])
  labels: int   [...]      (usually [B, H, W])
All reductions follow the reference exactly (documented per function).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy

Array = jax.Array


def _one_hot(labels: Array, num_classes: int, dtype) -> Array:
    return jax.nn.one_hot(labels, num_classes, dtype=dtype)


# ---------------------------------------------------------------------------
# Cross entropy
# ---------------------------------------------------------------------------

def cross_entropy_loss(
    logits: Array,
    labels: Array,
    weight: Optional[Array] = None,
    ignore_index: Optional[int] = None,
) -> Array:
    """Multi-class CE, mean over pixels.

    Matches torch.nn.CrossEntropyLoss semantics used throughout the reference
    trainers (e.g. /root/reference/UAPS_train.py:75,194-197): mean reduction;
    with per-class `weight` the mean is the weighted mean (sum w_i * nll_i /
    sum w_i); `ignore_index` pixels contribute neither numerator nor
    denominator (reference utilities/pytorch_losses.py:31-51 uses ignore=255).
    """
    num_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    labels_clipped = jnp.clip(labels, 0, num_classes - 1)
    # gather-free: one-hot multiply-sum instead of take_along_axis — a
    # per-pixel gather is a scalar-unit path on TPU and dominated the loss
    # pipeline (8 CE calls/step on 1M-pixel maps in the UAPS step)
    one_hot = jax.nn.one_hot(labels_clipped, num_classes,
                             dtype=log_probs.dtype)
    nll = -jnp.sum(log_probs * one_hot, axis=-1)

    if weight is not None:
        w = jnp.sum(one_hot * jnp.asarray(weight, dtype=log_probs.dtype),
                    axis=-1)
    else:
        w = jnp.ones_like(nll)

    if ignore_index is not None:
        valid = (labels != ignore_index).astype(log_probs.dtype)
        w = w * valid

    denom = jnp.sum(w)
    return jnp.sum(w * nll) / jnp.maximum(denom, 1e-12)


def binary_cross_entropy_loss(
    logits: Array, targets: Array, pos_weight: Optional[Array] = None
) -> Array:
    """Sigmoid BCE with optional positive-class weight.

    Matches F.binary_cross_entropy_with_logits mean reduction
    (reference utilities/pytorch_losses.py:9-28).
    """
    targets = targets.astype(logits.dtype)
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    if pos_weight is None:
        loss = -(targets * log_p + (1.0 - targets) * log_not_p)
    else:
        loss = -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)
    return jnp.mean(loss)


# ---------------------------------------------------------------------------
# Region losses (dice / jaccard / tversky)
# ---------------------------------------------------------------------------

def _probs_and_one_hot(logits: Array, labels: Array):
    """Shared prep for the region losses.

    Multi-class: softmax probs + one-hot labels. The reference's binary
    (C==1) path (pytorch_losses.py:71-79) builds a [pos, neg] 2-channel
    stack from sigmoid; we reproduce that so C==1 logits behave identically.
    """
    num_classes = logits.shape[-1]
    if num_classes == 1:
        pos = jax.nn.sigmoid(logits)
        probs = jnp.concatenate([pos, 1.0 - pos], axis=-1)
        oh = _one_hot(labels, 2, logits.dtype)
        # reference orders the stack [class1, class0]
        one_hot = jnp.stack([oh[..., 1], oh[..., 0]], axis=-1)
    else:
        probs = jax.nn.softmax(logits, axis=-1)
        one_hot = _one_hot(labels, num_classes, logits.dtype)
    return probs, one_hot


def softmax_dice_loss(logits: Array, labels: Array, eps: float = 1e-7) -> Array:
    """Soft Dice loss, the workhorse loss of every trainer.

    Pinned to reference utilities/pytorch_losses.py:54-89: per-class
    intersection/cardinality summed over batch+spatial dims, dice averaged
    over classes (including background), returns 1 - dice. eps only in the
    denominator, numerator NOT smoothed.
    """
    probs, one_hot = _probs_and_one_hot(logits, labels)
    dims = tuple(range(probs.ndim - 1))  # batch + spatial
    intersection = jnp.sum(probs * one_hot, axis=dims)
    cardinality = jnp.sum(probs + one_hot, axis=dims)
    dice = jnp.mean(2.0 * intersection / (cardinality + eps))
    return 1.0 - dice


def dice_loss_per_class(
    probs: Array, one_hot: Array, smooth: float = 1e-5
) -> Array:
    """DiceLoss-style (losses_1.py:100-136) squared-denominator dice.

    Operates on probs (softmax already applied) + one-hot target; global sum
    (no per-class batch split), averaged over classes by the caller.
    Returns per-class loss vector 1 - (2 I + s)/(sum p^2 + sum t^2 + s).
    """
    dims = tuple(range(probs.ndim - 1))
    intersect = jnp.sum(probs * one_hot, axis=dims)
    z = jnp.sum(probs * probs, axis=dims)
    y = jnp.sum(one_hot * one_hot, axis=dims)
    return 1.0 - (2.0 * intersect + smooth) / (z + y + smooth)


def jaccard_loss(logits: Array, labels: Array, eps: float = 1e-7) -> Array:
    """IoU loss (reference utilities/pytorch_losses.py:92-128)."""
    probs, one_hot = _probs_and_one_hot(logits, labels)
    dims = tuple(range(probs.ndim - 1))
    intersection = jnp.sum(probs * one_hot, axis=dims)
    cardinality = jnp.sum(probs + one_hot, axis=dims)
    union = cardinality - intersection
    jacc = jnp.mean(intersection / (union + eps))
    return 1.0 - jacc


def tversky_loss(
    logits: Array, labels: Array, alpha: float, beta: float, eps: float = 1e-7
) -> Array:
    """Tversky loss (reference utilities/pytorch_losses.py:131-175)."""
    probs, one_hot = _probs_and_one_hot(logits, labels)
    dims = tuple(range(probs.ndim - 1))
    intersection = jnp.sum(probs * one_hot, axis=dims)
    fps = jnp.sum(probs * (1.0 - one_hot), axis=dims)
    fns = jnp.sum((1.0 - probs) * one_hot, axis=dims)
    tversky = jnp.mean(intersection / (intersection + alpha * fps + beta * fns + eps))
    return 1.0 - tversky


def focal_loss(
    logits: Array,
    labels: Array,
    gamma: float = 2.0,
    alpha: Optional[Array] = None,
    size_average: bool = True,
) -> Array:
    """Multi-class focal loss (reference utilities/losses_1.py:63-97).

    pt is detached (Variable(logpt.data.exp()) in the reference), so the
    focusing factor carries no gradient; alpha is a per-class weight vector.
    """
    num_classes = logits.shape[-1]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    one_hot = jax.nn.one_hot(jnp.clip(labels, 0, num_classes - 1),
                             num_classes, dtype=log_probs.dtype)
    logpt = jnp.sum(log_probs * one_hot, axis=-1)  # gather-free
    pt = jax.lax.stop_gradient(jnp.exp(logpt))
    if alpha is not None:
        at = jnp.sum(one_hot * jnp.asarray(alpha, dtype=log_probs.dtype),
                     axis=-1)
        logpt = logpt * at
    loss = -((1.0 - pt) ** gamma) * logpt
    return jnp.mean(loss) if size_average else jnp.sum(loss)


# ---------------------------------------------------------------------------
# Consistency losses
# ---------------------------------------------------------------------------

def softmax_mse_loss(input_logits: Array, target_logits: Array,
                     sigmoid: bool = False) -> Array:
    """Elementwise (softmax(a) - stopgrad(softmax(b)))^2 — NO reduction.

    Matches reference utilities/losses_1.py:9-26 which returns the
    unreduced elementwise MSE; callers (MT/CCT/...) apply torch.mean.
    Gradient flows to `input_logits` only (the reference relies on the
    teacher being under no_grad; we make it explicit with stop_gradient).
    """
    if sigmoid:
        input_p = jax.nn.sigmoid(input_logits)
        target_p = jax.nn.sigmoid(target_logits)
    else:
        input_p = jax.nn.softmax(input_logits, axis=-1)
        target_p = jax.nn.softmax(target_logits, axis=-1)
    target_p = jax.lax.stop_gradient(target_p)
    return (input_p - target_p) ** 2


def softmax_kl_loss(input_logits: Array, target_logits: Array,
                    sigmoid: bool = False) -> Array:
    """KL(softmax(target) || softmax(input)), 'mean' reduction over ALL
    elements (matching torch F.kl_div(reduction='mean') exactly — divides by
    numel, not batch; reference utilities/losses_1.py:29-48)."""
    if sigmoid:
        input_log = jnp.log(jax.nn.sigmoid(input_logits))
        target_p = jax.nn.sigmoid(target_logits)
    else:
        input_log = jax.nn.log_softmax(input_logits, axis=-1)
        target_p = jax.nn.softmax(target_logits, axis=-1)
    target_p = jax.lax.stop_gradient(target_p)
    kl = xlogy(target_p, target_p) - target_p * input_log
    return jnp.mean(kl)


def symmetric_mse_loss(input1: Array, input2: Array) -> Array:
    """mean((a-b)^2), gradients to both sides (losses_1.py:51-60)."""
    return jnp.mean((input1 - input2) ** 2)


def kl_divergence_map(logits: Array, target_probs: Array) -> Array:
    """Per-pixel KL uncertainty map: sum_c p_c (log p_c - log_softmax(logits)_c).

    This is the UAPS `variance_*` map: torch.sum(KLDivLoss(reduction='none')
    (log_softmax(dec), preds), dim=1) at /root/reference/UAPS_train.py:226-239.
    xlogy gives torch's 0*log0 = 0 convention. Gradients flow through BOTH
    arguments — the reference never detaches `preds` (the 4-decoder
    average), and neither do we; pass stop_gradient(target_probs) yourself
    if you want a detached target.

    Returns [..., ] map with the class axis reduced.
    """
    logq = jax.nn.log_softmax(logits, axis=-1)
    p = target_probs
    return jnp.sum(xlogy(p, p) - p * logq, axis=-1)


def entropy_minimization(probs: Array) -> Array:
    """mean over pixels of -sum_c p log(p + 1e-6) (losses_1.py:139-143)."""
    return jnp.mean(-jnp.sum(probs * jnp.log(probs + 1e-6), axis=-1))


def entropy_map(probs: Array) -> Array:
    """Per-pixel entropy map, class axis kept as size-1 (losses_1.py:146-149)."""
    return -jnp.sum(probs * jnp.log(probs + 1e-6), axis=-1, keepdims=True)


def feature_sim_loss(f1: Array, f2: Array) -> Array:
    """Gram-matrix similarity loss between two batches of features.

    Matches reference utilities/losses_1.py:152-170: flatten each example,
    G = f f^T ([B,B]), L2-normalize rows, MSE between the two normalized
    Gram matrices. The B×B Gram matmul maps to the MXU.
    """
    b = f1.shape[0]
    f1 = f1.reshape(b, -1)
    f2 = f2.reshape(b, -1)
    g1 = f1 @ f1.T
    g2 = f2 @ f2.T
    g1 = g1 / jnp.maximum(jnp.linalg.norm(g1, axis=1, keepdims=True), 1e-12)
    g2 = g2 / jnp.maximum(jnp.linalg.norm(g2, axis=1, keepdims=True), 1e-12)
    return jnp.mean((g1 - g2) ** 2)
