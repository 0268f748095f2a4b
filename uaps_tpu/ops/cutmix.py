"""CutMix / cross-CutMix ops for UCC, as jit-safe jnp functions.

Pinned to /root/reference/UCC/cross_cutmix.py:60-123. The reference builds
masks on the host per-sample in a Python loop; here mask construction uses
broadcasted iota comparisons with traced rectangle coordinates, so the whole
augmentation lives inside the jitted train step (static shapes, VPU-friendly).

Mask convention matches the reference: 1 OUTSIDE the rectangle, 0 inside,
so `a * mask + b * (1 - mask)` pastes a rectangle of `b` into `a`.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def cutout_mask(key: Array, im_h: int, im_w: int, ratio: int = 2) -> Array:
    """[H, W] float mask with one random rectangle of ~area H*W/ratio zeroed
    (cross_cutmix.py:60-75). Width ~ U{W/ratio+1, W-1}, height = area/w."""
    kw, kx, ky = jax.random.split(key, 3)
    area = im_h * im_w / ratio
    w_lo = im_w // ratio + 1
    w = jax.random.randint(kw, (), w_lo, im_w)      # [w_lo, im_w)
    h = jnp.round(area / w).astype(jnp.int32)
    x0 = jax.random.randint(kx, (), 0, im_w - w + 1)
    y0 = jax.random.randint(ky, (), 0, jnp.maximum(im_h - h + 1, 1))
    xx = jax.lax.broadcasted_iota(jnp.int32, (im_h, im_w), 1)
    yy = jax.lax.broadcasted_iota(jnp.int32, (im_h, im_w), 0)
    inside = ((xx >= x0) & (xx < x0 + w) & (yy >= y0) & (yy < y0 + h))
    return jnp.where(inside, 0.0, 1.0)


def generate_mix_data(key: Array, images: Array, labels: Array,
                      p: float = 0.2) -> Tuple[Array, Array]:
    """Within-batch labeled CutMix (cross_cutmix.py:78-99): per sample i,
    with prob p paste a rectangle of sample (i+1)%B into it (image AND
    label). images NHWC, labels [B,H,W] int."""
    b, h, w, _ = images.shape
    k_gate, k_masks = jax.random.split(key)
    gates = jax.random.bernoulli(k_gate, p, (b,))
    masks = jax.vmap(lambda k: cutout_mask(k, h, w))(
        jax.random.split(k_masks, b))                    # [B,H,W]
    rolled_img = jnp.roll(images, -1, axis=0)
    rolled_lab = jnp.roll(labels, -1, axis=0)
    m4 = masks[..., None]
    mixed_img = images * m4 + rolled_img * (1.0 - m4)
    mixed_lab = (labels * masks + rolled_lab * (1.0 - masks)).astype(
        labels.dtype)
    gate_img = gates[:, None, None, None]
    gate_lab = gates[:, None, None]
    return (jnp.where(gate_img, mixed_img, images),
            jnp.where(gate_lab, mixed_lab, labels))


def generate_crossmix_data(key: Array, labeled: Array, weak: Array,
                           strong: Array, p: float = 0.3
                           ) -> Tuple[Array, Array]:
    """Cross CutMix labeled content into the weak & strong unlabeled streams
    (cross_cutmix.py:101-123): per sample, ONE mask and ONE gate shared by
    the weak/strong pair (so the pair stays aligned)."""
    b, h, w, _ = labeled.shape
    k_gate, k_masks = jax.random.split(key)
    gates = jax.random.bernoulli(k_gate, p, (b,))[:, None, None, None]
    masks = jax.vmap(lambda k: cutout_mask(k, h, w))(
        jax.random.split(k_masks, b))[..., None]
    new_wk = jnp.where(gates, weak * masks + labeled * (1.0 - masks), weak)
    new_st = jnp.where(gates, strong * masks + labeled * (1.0 - masks),
                       strong)
    return new_wk, new_st
