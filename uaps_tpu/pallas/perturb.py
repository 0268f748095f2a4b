"""Fused dropout with on-core PRNG and a mask-regenerating custom VJP.

The UAPS aux-decoder perturbations (UAPS_unet.py:156-185) are linear in x
given their masks; torch stores each mask for backward. Here the TPU
kernel seeds the per-core PRNG, generates the keep-mask, and applies
inverted dropout in one VMEM pass; the BACKWARD kernel re-seeds the same
PRNG and regenerates the identical mask — zero residual bytes to HBM
(the pattern the reference can't express: its mask is torch autograd
state).

On non-TPU platforms a jax.random-based implementation with the same
custom-VJP structure is used (different bit-stream, same distribution).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mask_from_bits(bits: jax.Array, rate: float) -> jax.Array:
    """uint32 random bits -> keep mask with P(keep) = 1 - rate."""
    threshold = jnp.uint32(int((1.0 - rate) * (2 ** 32 - 1)))
    return (bits <= threshold)


def _fwd_kernel(seed_ref, x_ref, out_ref, *, rate: float):
    pltpu.prng_seed(seed_ref[0])
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = _mask_from_bits(bits, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), x_ref.dtype)
    out_ref[...] = jnp.where(keep, x_ref[...] * scale,
                             jnp.zeros_like(x_ref[...]))


def _bwd_kernel(seed_ref, g_ref, out_ref, *, rate: float):
    # regenerate the identical mask from the same seed
    pltpu.prng_seed(seed_ref[0])
    bits = pltpu.bitcast(pltpu.prng_random_bits(g_ref.shape), jnp.uint32)
    keep = _mask_from_bits(bits, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), g_ref.dtype)
    out_ref[...] = jnp.where(keep, g_ref[...] * scale,
                             jnp.zeros_like(g_ref[...]))


def _call(kernel, seed, x, rate, interpret):
    return pl.pallas_call(
        functools.partial(kernel, rate=rate),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(seed, x)


def _use_pallas():
    return jax.devices()[0].platform == "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dropout(x: jax.Array, seed: jax.Array, rate: float = 0.5):
    """Inverted dropout; `seed` is an int32 scalar array.

    TPU: pallas kernel with regenerated-mask backward (no residuals).
    Other platforms: jax.random equivalent (mask also regenerated).
    """
    if _use_pallas():
        return _call(_fwd_kernel, seed.reshape(1), x, rate, False)
    keep = jax.random.bernoulli(jax.random.key(seed.astype(jnp.uint32)),
                                1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def _fwd(x, seed, rate):
    return fused_dropout(x, seed, rate), seed


def _bwd(rate, seed, g):
    if _use_pallas():
        dx = _call(_bwd_kernel, seed.reshape(1), g, rate, False)
    else:
        keep = jax.random.bernoulli(
            jax.random.key(seed.astype(jnp.uint32)), 1.0 - rate, g.shape)
        dx = jnp.where(keep, g / (1.0 - rate), jnp.zeros_like(g))
    return dx, None


fused_dropout.defvjp(_fwd, _bwd)
