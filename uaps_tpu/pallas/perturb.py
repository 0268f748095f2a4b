"""Fused perturbation kernels with on-core PRNG and mask-regenerating VJPs.

The UAPS aux-decoder perturbations (reference utilities/UAPS_unet.py:
156-185 — Dropout, FeatureNoise, FeatureDropout) are (piecewise-) linear
in x given their random draws; torch stores each mask/noise tensor for
backward. Here each TPU kernel seeds the per-core PRNG, draws the
randomness, and applies the perturbation in one VMEM pass over a
per-example grid; the BACKWARD kernel re-seeds the same PRNG and
regenerates the identical draw — zero residual bytes to HBM for
dropout/noise (the pattern the reference cannot express: its masks are
torch autograd state). FeatureDropout's mask depends on x (attention
threshold), so x itself is the only residual.

Semantics per reference:
  dropout          F.dropout(x, 0.5): per-element keep, survivors / (1-p)
  feature_noise    noise ~ U(-r, r) of shape x.shape[1:], SHARED across
                   the batch; out = x * (1 + noise)        (:172-185)
  feature_dropout  attention = mean over channels; per-example spatial
                   max; ONE scalar ~U(0.7, 0.9) per call; zero pixels
                   with attention >= scalar * max            (:161-169)

On non-TPU platforms jax.random-based implementations with the same
custom-VJP structure run instead (different bit-stream, same
distribution).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mask_from_bits(bits: jax.Array, rate: float) -> jax.Array:
    """uint32 random bits -> keep mask with P(keep) = 1 - rate."""
    threshold = jnp.uint32(int((1.0 - rate) * (2 ** 32 - 1)))
    return (bits <= threshold)


def _uniform01(shape) -> jax.Array:
    """f32 uniform in [0, 1) from the seeded per-core PRNG (24-bit).

    Mosaic has no uint32->f32 cast; the top-8-bit shift leaves a
    non-negative value, so bitcast to int32 first."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    i24 = pltpu.bitcast(bits >> 8, jnp.int32)
    return i24.astype(jnp.float32) * (1.0 / (1 << 24))


def _use_pallas():
    return jax.devices()[0].platform == "tpu"


_LANE = 128
_MAX_SUB = 2048   # sublanes per block: 1 MB of int32 random bits


def _lane_blocks(x):
    """(sublanes_per_example, chunk) for the lane-aligned elementwise
    view of x, or (0, 0) when the per-example size isn't lane-aligned.

    Dropout and feature-noise are elementwise, so the kernel is free to
    view each example as [S, 128] rows instead of the model's activation
    layout. This matters: a [1, H, W, C] NHWC block with C < 128 puts C
    in the lane dim and Mosaic relayouts the int32 random-bits tensor at
    128/C x memory cost — measured as a 64 MB scoped-VMEM OOM on
    [16,256,256,16] bf16 (the C=16 in_conv dropout of the NHWC
    deep-supervision models). The [S, 128] view wastes zero lanes for
    any per-example size divisible by 128 and is chunked to at most
    _MAX_SUB sublanes so scoped VMEM stays bounded for f32 inputs too."""
    if x.ndim < 3:
        return 0, 0
    rest = math.prod(x.shape[1:])
    if rest % _LANE:
        return 0, 0
    sub = rest // _LANE
    return sub, math.gcd(sub, _MAX_SUB)


def _elemwise_call(kernel, seed, x, interpret):
    """Grid an elementwise kernel over (batch, chunks) of the lane-
    aligned [B, S, 128] view. kernel(seed_ref, x_block, o_block) sees
    [1, chunk, 128] blocks and derives its own per-program seed offset
    from the grid. Caller must have checked _lane_blocks(x)[0] > 0."""
    b = x.shape[0]
    sub, chunk = _lane_blocks(x)
    x3 = x.reshape(b, sub, _LANE)
    idx = lambda bi, ci: (bi, ci, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel,
        grid=(b, sub // chunk),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, chunk, _LANE), idx,
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, chunk, _LANE), idx,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        interpret=interpret,
    )(seed, x3)
    return out.reshape(x.shape)


def _batched_call(kernel, seed, x, interpret, n_out_like=None):
    """Run `kernel(seed_ref, x_block, o_block)` over a leading-axis grid
    (one example per program). Falls back to a single program for rank<3
    arrays (test shapes)."""
    if x.ndim >= 3:
        b = x.shape[0]
        rest = x.shape[1:]
        blk = (1,) + rest
        idx = lambda bi: (bi,) + (0,) * len(rest)  # noqa: E731
        return pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=interpret,
        )(seed, x)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(seed, x)


# ---------------------------------------------------------------------------
# dropout (per-element mask, differs per example)
# ---------------------------------------------------------------------------

def _dropout_kernel(seed_ref, x_ref, o_ref, *, rate: float, gridded: bool):
    # per-example seed offset -> per-example masks like F.dropout
    off = pl.program_id(0) if gridded else 0
    pltpu.prng_seed(seed_ref[0] + off)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = _mask_from_bits(bits, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), x_ref.dtype)
    o_ref[...] = jnp.where(keep, x_ref[...] * scale,
                           jnp.zeros_like(x_ref[...]))


def _dropout_kernel_lanes(seed_ref, x_ref, o_ref, *, rate: float):
    # distinct bits per example AND per chunk
    off = pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    pltpu.prng_seed(seed_ref[0] + off)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = _mask_from_bits(bits, rate)
    scale = jnp.asarray(1.0 / (1.0 - rate), x_ref.dtype)
    o_ref[...] = jnp.where(keep, x_ref[...] * scale,
                           jnp.zeros_like(x_ref[...]))


def _dropout_call(seed, x, rate, interpret):
    if _lane_blocks(x)[0]:
        k = functools.partial(_dropout_kernel_lanes, rate=rate)
        return _elemwise_call(k, seed.reshape(1), x, interpret)
    k = functools.partial(_dropout_kernel, rate=rate, gridded=x.ndim >= 3)
    return _batched_call(k, seed.reshape(1), x, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_dropout(x: jax.Array, seed: jax.Array, rate: float = 0.5):
    """Inverted dropout; `seed` is an int32 scalar array.

    TPU: pallas kernel with regenerated-mask backward (no residuals).
    Other platforms: jax.random equivalent (mask also regenerated).
    """
    if _use_pallas():
        return _dropout_call(seed, x, rate, False)
    keep = jax.random.bernoulli(jax.random.key(seed.astype(jnp.uint32)),
                                1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def _fwd(x, seed, rate):
    return fused_dropout(x, seed, rate), seed


def _bwd(rate, seed, g):
    # dropout is linear given the mask: dx = mask-applied g; the mask is
    # regenerated from the same seed, never stored
    if _use_pallas():
        dx = _dropout_call(seed, g, rate, False)
    else:
        keep = jax.random.bernoulli(
            jax.random.key(seed.astype(jnp.uint32)), 1.0 - rate, g.shape)
        dx = jnp.where(keep, g / (1.0 - rate), jnp.zeros_like(g))
    return dx, None


fused_dropout.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# feature noise (U(-r, r) of shape x.shape[1:], shared across the batch)
# ---------------------------------------------------------------------------

def _noise_kernel(seed_ref, x_ref, o_ref, *, rng: float):
    # SAME seed in every program -> identical noise per example, matching
    # the reference's batch-broadcast noise (UAPS_unet.py:177-181)
    pltpu.prng_seed(seed_ref[0])
    u = _uniform01(x_ref.shape) * (2.0 * rng) - rng
    o_ref[...] = (x_ref[...].astype(jnp.float32)
                  * (1.0 + u)).astype(o_ref.dtype)


def _noise_kernel_lanes(seed_ref, x_ref, o_ref, *, rng: float):
    # seed depends on the CHUNK only: every example of a chunk draws the
    # same bits -> noise stays batch-broadcast in the lane-aligned view
    pltpu.prng_seed(seed_ref[0] + pl.program_id(1))
    u = _uniform01(x_ref.shape) * (2.0 * rng) - rng
    o_ref[...] = (x_ref[...].astype(jnp.float32)
                  * (1.0 + u)).astype(o_ref.dtype)


def _noise_call(seed, x, rng, interpret):
    if _lane_blocks(x)[0]:
        k = functools.partial(_noise_kernel_lanes, rng=rng)
        return _elemwise_call(k, seed.reshape(1), x, interpret)
    k = functools.partial(_noise_kernel, rng=rng)
    return _batched_call(k, seed.reshape(1), x, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_feature_noise(x: jax.Array, seed: jax.Array,
                        uniform_range: float = 0.3):
    """x * (1 + U(-r, r)), noise shared across the batch axis."""
    if _use_pallas():
        return _noise_call(seed, x, uniform_range, False)
    noise = jax.random.uniform(
        jax.random.key(seed.astype(jnp.uint32)), x.shape[1:],
        dtype=jnp.float32, minval=-uniform_range, maxval=uniform_range)
    return (x.astype(jnp.float32) * (1.0 + noise[None])).astype(x.dtype)


def _noise_fwd(x, seed, rng):
    return fused_feature_noise(x, seed, rng), seed


def _noise_bwd(rng, seed, g):
    # linear in x with fixed noise: dx = g * (1 + noise), regenerated
    return fused_feature_noise(g, seed, rng), None


fused_feature_noise.defvjp(_noise_fwd, _noise_bwd)


# ---------------------------------------------------------------------------
# feature dropout (attention-thresholded spatial mask)
# ---------------------------------------------------------------------------

def _fdrop_kernel(seed_ref, x_ref, o_ref, *, channel_axis: int):
    # ONE scalar ~U(0.7, 0.9) per call (same seed every program -> shared
    # across the batch, matching np.random.uniform in the reference :165)
    pltpu.prng_seed(seed_ref[0])
    scale = 0.7 + 0.2 * _uniform01((1, 1))[0, 0]
    x = x_ref[...].astype(jnp.float32)          # [1, d1, d2, d3]
    att = jnp.mean(x, axis=channel_axis, keepdims=True)
    mx = jnp.max(att)                            # per-example spatial max
    mask = (att < mx * scale).astype(jnp.float32)
    o_ref[...] = (x * mask).astype(o_ref.dtype)


def _fdrop_call(seed, x, channel_axis, interpret):
    ax = channel_axis % x.ndim
    assert x.ndim == 4 and ax != 0, (x.shape, channel_axis)
    k = functools.partial(_fdrop_kernel, channel_axis=ax)
    return _batched_call(k, seed.reshape(1), x, interpret)


def _fdrop_pallas_ok(x, channel_axis) -> bool:
    """FeatureDropout's in-kernel attention map keeps the block's layout
    with the channel dim reduced to 1; when the channel is the LANE dim
    (NHWC) the map pads 1 -> 128 lanes, costing 128x VMEM — 32 MB for a
    [1,256,256,1] f32 map, a scoped-VMEM OOM. Gate the kernel off for
    those shapes (the jax.random path below is pure XLA and runs fine
    on TPU); NCHW blocks reduce a sublane-side dim and stay tiny."""
    ax = channel_axis % x.ndim
    dims = [1 if i in (0, ax) else d for i, d in enumerate(x.shape)]
    lane = -(-dims[-1] // 128) * 128
    sub = -(-dims[-2] // 8) * 8
    lead = math.prod(dims[:-2])
    if lead * sub * lane * 4 > 4 * 1024 * 1024:
        return False
    # the [1, *x.shape[1:]] block itself is double-buffered in AND out:
    # 4x block bytes must stay under the ~16 MB scoped-VMEM limit. An
    # f32 [1,16,256,256] block (4 MB) exceeded it by 256 KB on-chip
    # (r4 entry() compile check); bf16 fits with room. VMEM blocks are
    # tile-padded, so count ceil-to-(8,128) trailing dims, not raw
    # elements (an unaligned trailing dim can double the footprint).
    blane = -(-x.shape[-1] // 128) * 128
    bsub = -(-x.shape[-2] // 8) * 8
    block = math.prod(x.shape[1:-2]) * bsub * blane * x.dtype.itemsize
    return 4 * block <= 15 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_feature_dropout(x: jax.Array, seed: jax.Array,
                          channel_axis: int = -1):
    """Attention-thresholded spatial dropout (reference FeatureDropout).

    The mask depends on x, so (matching torch, where comparisons are
    non-differentiable) the VJP treats the mask as constant: dx = g*mask,
    with x as the only residual."""
    if _use_pallas() and _fdrop_pallas_ok(x, channel_axis):
        return _fdrop_call(seed, x, channel_axis, False)
    att = jnp.mean(x.astype(jnp.float32), axis=channel_axis, keepdims=True)
    mx = jnp.max(att.reshape(x.shape[0], -1), axis=1)
    scale = jax.random.uniform(jax.random.key(seed.astype(jnp.uint32)), (),
                               minval=0.7, maxval=0.9)
    thr = (mx * scale).reshape((-1,) + (1,) * (x.ndim - 1))
    return (x.astype(jnp.float32)
            * (att < thr).astype(jnp.float32)).astype(x.dtype)


def _fdrop_fwd(x, seed, channel_axis):
    return fused_feature_dropout(x, seed, channel_axis), (x, seed)


def _fdrop_bwd(channel_axis, res, g):
    x, seed = res
    # regenerate the mask from x + the seeded scalar, apply to g. Reuse
    # the forward kernels on |sign trick|: mask*g == fwd(g with x's mask);
    # the kernel needs x to compute attention, so recompute via where():
    if _use_pallas() and _fdrop_pallas_ok(x, channel_axis):
        # one fused kernel pass: mask(x) applied to g
        ax = channel_axis % x.ndim

        def kern(seed_ref, x_ref, g_ref, o_ref):
            pltpu.prng_seed(seed_ref[0])
            scale = 0.7 + 0.2 * _uniform01((1, 1))[0, 0]
            xf = x_ref[...].astype(jnp.float32)
            att = jnp.mean(xf, axis=ax, keepdims=True)
            mask = (att < jnp.max(att) * scale).astype(jnp.float32)
            o_ref[...] = (g_ref[...].astype(jnp.float32)
                          * mask).astype(o_ref.dtype)

        b, rest = x.shape[0], x.shape[1:]
        blk = (1,) + rest
        idx = lambda bi: (bi,) + (0,) * len(rest)  # noqa: E731
        dx = pl.pallas_call(
            kern,
            grid=(b,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
                      pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        )(seed.reshape(1), x, g)
        return dx, None
    att = jnp.mean(x.astype(jnp.float32), axis=channel_axis, keepdims=True)
    mx = jnp.max(att.reshape(x.shape[0], -1), axis=1)
    scale = jax.random.uniform(jax.random.key(seed.astype(jnp.uint32)), (),
                               minval=0.7, maxval=0.9)
    thr = (mx * scale).reshape((-1,) + (1,) * (x.ndim - 1))
    dx = (g.astype(jnp.float32)
          * (att < thr).astype(jnp.float32)).astype(g.dtype)
    return dx, None


fused_feature_dropout.defvjp(_fdrop_fwd, _fdrop_bwd)
