"""Feature-space perturbations for the auxiliary decoders.

Pinned to /root/reference/utilities/UAPS_unet.py:156-185. The reference
scatters RNG across three frameworks (torch dropout, torch.distributions
uniform, numpy threshold scalar) and re-instantiates FeatureNoise modules
every forward; here each perturbation is a pure function of a jax PRNG key,
so the whole multi-decoder forward jits into one XLA program.

All functions take NHWC features [B, H, W, C].
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

Array = jax.Array


def feature_noise(key: Array, x: Array, uniform_range: float = 0.3) -> Array:
    """Multiplicative uniform noise, shared across the batch.

    Reference FeatureNoise (UAPS_unet.py:172-185) samples noise of shape
    x.shape[1:] (i.e. per-channel-per-pixel, broadcast over batch) from
    U(-r, r) and computes x * noise + x.
    """
    noise = jax.random.uniform(
        key, x.shape[1:], dtype=x.dtype,
        minval=-uniform_range, maxval=uniform_range,
    )
    return x * (1.0 + noise[None])


def dropout(key: Array, x: Array, rate: float = 0.5) -> Array:
    """Inverted dropout, matching F.dropout(x, p) train-mode semantics
    (UAPS_unet.py:156-158): zero with prob p, survivors scaled by 1/(1-p)."""
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def feature_dropout(key: Array, x: Array, channel_axis: int = -1) -> Array:
    """Attention-thresholded channel-mean spatial dropout.

    Reference FeatureDropout (UAPS_unet.py:161-169): attention = channel
    mean; per-example spatial max of attention scaled by ONE scalar
    ~U(0.7, 0.9) shared across the batch (np.random.uniform in the
    reference); pixels with attention >= threshold are zeroed.
    `channel_axis` selects the feature axis (-1 NHWC, 1 NCHW stages).
    """
    attention = jnp.mean(x, axis=channel_axis, keepdims=True)
    max_val = jnp.max(attention.reshape(x.shape[0], -1), axis=1)  # [B]
    scale = jax.random.uniform(key, (), dtype=x.dtype, minval=0.7, maxval=0.9)
    threshold = (max_val * scale).reshape((-1,) + (1,) * (x.ndim - 1))
    drop_mask = (attention < threshold).astype(x.dtype)
    return x * drop_mask


# Ordering matches the reference's aux decoder assignment
# (UAPS_unet.py:227-232): aux1 <- FeatureNoise, aux2 <- Dropout,
# aux3 <- FeatureDropout.
PERTURBATIONS = ("feature_noise", "dropout", "feature_dropout")


def _kernel_seed(key: Array) -> Array:
    """int32 seed for the pallas on-core PRNG, derived from a jax key."""
    data = jax.random.key_data(key).astype(jnp.uint32)
    return (data[..., 0] ^ data[..., -1]).astype(jnp.int32)


def perturb_features(
    key: Array, features: Sequence[Array], kind: str,
    channel_axes: Sequence[int] | None = None,
    backend: str = "auto",
) -> list[Array]:
    """Apply one perturbation kind to every skip tensor with split keys.

    The reference perturbs all five encoder features per aux decoder
    (UAPS_unet.py:227-232, list comprehension per skip). `channel_axes`
    gives the feature axis per tensor (default -1 everywhere; NCHW model
    stages pass 1 for their levels — noise/dropout are axis-agnostic,
    only feature_dropout's channel mean cares).

    On TPU (backend != "xla") 4-D tensors route through the fused pallas
    kernels (pallas/perturb.py): one PRNG pass in VMEM per example, masks
    regenerated in the backward instead of stored (SURVEY §2.5's planned
    native component). The jax.random path draws a different bit-stream
    with the same distribution.
    """
    keys = jax.random.split(key, len(features))
    axes = (list(channel_axes) if channel_axes is not None
            else [-1] * len(features))
    fused = (backend != "xla" and jax.devices()[0].platform == "tpu")
    if kind == "feature_noise":
        if fused:
            from uaps_tpu.pallas.perturb import fused_feature_noise
            return [fused_feature_noise(f, _kernel_seed(k))
                    if f.ndim == 4 else feature_noise(k, f)
                    for k, f in zip(keys, features)]
        return [feature_noise(k, f) for k, f in zip(keys, features)]
    if kind == "dropout":
        if fused:
            from uaps_tpu.pallas.perturb import fused_dropout
            return [fused_dropout(f, _kernel_seed(k))
                    if f.ndim == 4 else dropout(k, f)
                    for k, f in zip(keys, features)]
        return [dropout(k, f) for k, f in zip(keys, features)]
    if kind == "feature_dropout":
        if fused:
            from uaps_tpu.pallas.perturb import fused_feature_dropout
            return [fused_feature_dropout(f, _kernel_seed(k), a)
                    if f.ndim == 4 else feature_dropout(k, f, a)
                    for k, f, a in zip(keys, features, axes)]
        return [feature_dropout(k, f, a)
                for k, f, a in zip(keys, features, axes)]
    if kind == "none":
        return list(features)
    raise ValueError(f"unknown perturbation kind: {kind!r}")
