"""Implicit-GEMM 3x3 SAME conv for small channel counts (Pallas TPU).

Why: the U-Net's hottest layers are 3x3 convs at 256x256 with 16-32
channels. XLA lowers them via an HBM-materialized im2col (~300 MB at
bs16/256²/16ch), making them bandwidth-bound at ~2.4 TF/s — 10x below even
the 16-of-128-lane MXU ceiling for Cout=16. This kernel builds the im2col
patches IN VMEM per spatial slab (never touching HBM with them) and issues
one [rows, 9*Cin] x [9*Cin, Cout] MXU contraction per slab: K is fully
packed (144 for Cin=16), so the only remaining waste is the unavoidable
Cout/128 lane wall.

Layout: grid over (batch, H/slab). Each program sees a [slab+2, W, C]
input block (one-row halo on each side via overlapping index_map) and
writes a [slab, W, Cout] output block.

The backward pass reuses the SAME kernel:
  dx = conv3x3(dy, flip_hw(transpose_io(W)))   (stride-1 SAME dgrad)
  dW = wgrad kernel (per-slab [9*Cin, Cout] partial products accumulated
       across the sequential TPU grid into one output block)
exposed through jax.custom_vjp in `conv3x3_small`.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_slab(h: int) -> int:
    for s in (32, 16, 8):
        if h % s == 0:
            return s
    return h


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(x_ref, w_ref, o_ref, *, slab: int, width: int,
                cin: int, cout: int):
    """x_ref [1, slab+2, W, Cin] (halo rows via Element-indexed overlap),
    w_ref [9*Cin, Cout], o_ref [1, slab, W, Cout]."""
    x = x_ref[0]
    # build im2col in VMEM: rows = slab*W, cols = 9*Cin
    # tap order must match the weight packing in conv3x3_forward
    cols = []
    for dh in range(3):
        xh = x[dh:dh + slab]                      # [slab, W, Cin]
        # dw via lane shift with zero edge padding
        left = jnp.concatenate(
            [jnp.zeros((slab, 1, cin), x.dtype), xh[:, :-1]], axis=1)
        right = jnp.concatenate(
            [xh[:, 1:], jnp.zeros((slab, 1, cin), x.dtype)], axis=1)
        cols.extend([left, xh, right])
    patches = jnp.concatenate(cols, axis=-1)      # [slab, W, 9*Cin]
    patches = patches.reshape(slab * width, 9 * cin)
    out = jnp.dot(patches, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = out.reshape(slab, width, cout).astype(o_ref.dtype)


def _pack_weights(w: jax.Array) -> jax.Array:
    """[3, 3, Cin, Cout] -> [9*Cin, Cout] matching the kernel's tap order
    (dh-major, dw-minor, channel-minor)."""
    k3, k3b, cin, cout = w.shape
    return w.reshape(9 * cin, cout)


def conv3x3_forward(x: jax.Array, w: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """x [B, H, W, Cin] (bf16/f32), w [3, 3, Cin, Cout] -> [B, H, W, Cout].

    SAME padding, stride 1. Output dtype follows x.
    """
    b, h, width, cin = x.shape
    cout = w.shape[-1]
    slab = _pick_slab(h)
    n_slabs = h // slab

    # one-row halo on each side: pad H by 1 and overlap the blocks
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    wp = _pack_weights(w).astype(x.dtype)

    kernel = functools.partial(_fwd_kernel, slab=slab, width=width,
                               cin=cin, cout=cout)
    return pl.pallas_call(
        kernel,
        grid=(b, n_slabs),
        in_specs=[
            # Mosaic requires all dims Element when any is (element-
            # indexed overlapping halo blocks)
            pl.BlockSpec((pl.Element(1), pl.Element(slab + 2),
                          pl.Element(width), pl.Element(cin)),
                         lambda bi, si: (bi, si * slab, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, slab, width, cout),
                               lambda bi, si: (bi, si, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, width, cout), x.dtype),
        interpret=interpret,
    )(xp, wp)


# ---------------------------------------------------------------------------
# weight gradient
# ---------------------------------------------------------------------------

def _wgrad_kernel(x_ref, g_ref, o_ref, *, slab: int, width: int,
                  cin: int, cout: int):
    """x_ref [1, slab+2, W, Cin], g_ref [1, slab, W, Cout],
    o_ref [9*Cin, Cout] accumulated across the sequential grid."""
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[0]
    cols = []
    for dh in range(3):
        xh = x[dh:dh + slab]
        left = jnp.concatenate(
            [jnp.zeros((slab, 1, cin), x.dtype), xh[:, :-1]], axis=1)
        right = jnp.concatenate(
            [xh[:, 1:], jnp.zeros((slab, 1, cin), x.dtype)], axis=1)
        cols.extend([left, xh, right])
    patches = jnp.concatenate(cols, axis=-1).reshape(slab * width, 9 * cin)
    g = g_ref[0].reshape(slab * width, cout)
    o_ref[...] += jnp.dot(patches.T, g,
                          preferred_element_type=jnp.float32
                          ).astype(o_ref.dtype)


def conv3x3_wgrad(x: jax.Array, g: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """dL/dW for conv3x3_forward: x [B,H,W,Cin], g [B,H,W,Cout] ->
    [3,3,Cin,Cout] (f32)."""
    b, h, width, cin = x.shape
    cout = g.shape[-1]
    slab = _pick_slab(h)
    n_slabs = h // slab
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    kernel = functools.partial(_wgrad_kernel, slab=slab, width=width,
                               cin=cin, cout=cout)
    flat = pl.pallas_call(
        kernel,
        grid=(b, n_slabs),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(slab + 2),
                          pl.Element(width), pl.Element(cin)),
                         lambda bi, si: (bi, si * slab, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, slab, width, cout),
                         lambda bi, si: (bi, si, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda bi, si: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        interpret=interpret,
    )(xp, g)
    return flat.reshape(3, 3, cin, cout)


# ---------------------------------------------------------------------------
# custom-vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_small(x: jax.Array, w: jax.Array,
                  interpret: bool = False) -> jax.Array:
    """Differentiable 3x3 SAME stride-1 conv via the implicit-GEMM kernel."""
    return conv3x3_forward(x, w, interpret)


def _vjp_fwd(x, w, interpret):
    return conv3x3_forward(x, w, interpret), (x, w)


def _vjp_bwd(interpret, res, g):
    x, w = res
    # dgrad: SAME stride-1 conv of g with spatially-flipped, IO-swapped W
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv3x3_forward(g.astype(x.dtype), w_rot, interpret)
    dw = conv3x3_wgrad(x, g, interpret).astype(w.dtype)
    return dx, dw


conv3x3_small.defvjp(_vjp_fwd, _vjp_bwd)


def reference_conv3x3(x, w):
    """XLA oracle."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
