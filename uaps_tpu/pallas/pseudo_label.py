"""Fused Dirichlet-mixed pseudo-label kernel.

Computes  pseudo = argmax_c( sum_d w_d * softmax_c(logits[d]) )  over the
D decoder outputs — the dynamically-mixed pseudo-label of
/root/reference/UAPS_train.py:251-255 — in ONE pass over VMEM, instead of
materializing D softmax arrays + the weighted mix in HBM.

This path is stop-gradient by construction (argmax), so no custom VJP is
needed. Layout: channels-first [D, C, H, W] so the (sublane, lane) dims
are the well-tiled spatial dims; D and C are small static leading dims the
kernel unrolls into [H, W] elementwise VPU ops (max/exp/sum/compare).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_impl(logits: jax.Array, weights: jax.Array) -> jax.Array:
    """jnp oracle: logits [D, B, H, W, C], weights [D] -> pseudo [B,H,W]."""
    softs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    mix = jnp.einsum("d,dbhwc->bhwc", weights.astype(jnp.float32), softs)
    return jnp.argmax(mix, axis=-1).astype(jnp.int32)


def _kernel(w_ref, x_ref, out_ref, *, n_dec: int, n_classes: int):
    """x_ref [1, D, C, H, W]; everything unrolled over D and C."""
    h, w = x_ref.shape[-2:]
    # per-decoder softmax normalizers
    inv_sums = []
    maxes = []
    for d in range(n_dec):
        m = x_ref[0, d, 0].astype(jnp.float32)
        for c in range(1, n_classes):
            m = jnp.maximum(m, x_ref[0, d, c].astype(jnp.float32))
        s = jnp.zeros((h, w), jnp.float32)
        for c in range(n_classes):
            s = s + jnp.exp(x_ref[0, d, c].astype(jnp.float32) - m)
        maxes.append(m)
        inv_sums.append(1.0 / s)
    # weighted mix per class, running argmax
    best_val = jnp.full((h, w), -1.0, jnp.float32)
    best_idx = jnp.zeros((h, w), jnp.int32)
    for c in range(n_classes):
        mix = jnp.zeros((h, w), jnp.float32)
        for d in range(n_dec):
            mix = mix + w_ref[d] * jnp.exp(
                x_ref[0, d, c].astype(jnp.float32) - maxes[d]) * inv_sums[d]
        take = mix > best_val
        best_val = jnp.where(take, mix, best_val)
        best_idx = jnp.where(take, c, best_idx)
    out_ref[0] = best_idx


@functools.partial(jax.jit, static_argnames=("force_pallas",))
def fused_pseudo_label(logits: jax.Array, weights: jax.Array,
                       force_pallas: bool = False) -> jax.Array:
    """logits [D, B, H, W, C] (any float dtype), weights [D] -> [B, H, W].

    Uses the Pallas kernel on TPU, the jnp oracle elsewhere (and under
    `force_pallas` runs the kernel in interpret mode for testing).
    """
    logits = jax.lax.stop_gradient(logits)
    weights = jax.lax.stop_gradient(weights)
    on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu or force_pallas):
        return _reference_impl(logits, weights)

    d, b, h, w, c = logits.shape
    x = jnp.transpose(logits, (1, 0, 4, 2, 3))   # [B, D, C, H, W]
    kernel = functools.partial(_kernel, n_dec=d, n_classes=c)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # weights, whole
            pl.BlockSpec((1, d, c, h, w), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        interpret=not on_tpu,
    )(weights.astype(jnp.float32), x)
    return out
