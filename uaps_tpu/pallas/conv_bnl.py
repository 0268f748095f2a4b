"""BN-normalize + LeakyReLU + 3x3-conv fused kernel (the ConvBlock core).

The reference ConvBlock (utilities/UAPS_unet.py:31-47) is
conv-BN-LeakyReLU x2; on TPU the middle normalize+leaky materializes a
full activation tensor between the two convs (profiled: ~64 MB of HBM
round-trip per high-res block, plus matching backward passes). This
kernel consumes the FIRST conv's raw output `y` and applies

    z = leaky_relu(y * f + s)        (f, s: per-channel BN factor/shift,
                                      conv bias folded into s)
    out = conv3x3_SAME(z, w)

inside the conv's VMEM prologue — z never touches HBM. The custom VJP
fuses the matching epilogue into the dgrad kernel (dy = dz * leaky'(a) *
f, with df/ds reduced in-kernel) and recomputes z in the wgrad kernel's
prologue, so the backward adds no extra elementwise passes either.

Layout/blocking matches conv3x3_nchw.py ('taps' variant): [C, H, W]
channels-in-sublanes blocks, nine [Co, C] x [C, slab*W] MXU matmuls.
Boundary correctness: the prologue runs on the PADDED block, then a
validity mask zeroes the halo outside the true image so the SAME-conv
sees zero padding of z (leaky(s) != 0 would otherwise leak in).

Non-TPU platforms use `conv3x3_bnl_reference` (same math, XLA autodiff).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uaps_tpu.pallas.conv3x3_nchw import _HOFF, _pick_slab

NEG_SLOPE = 0.01  # torch LeakyReLU default (reference uses default)


def _prologue_z(x, f_ref, s_ref, *, si, slab, width, cin, h):
    """Normalize+leaky+mask the padded halo block [C, slab+8, W+2]."""
    rows, wp = slab + 8, width + 2
    f = f_ref[...].reshape(cin, 1, 1)
    s = s_ref[...].reshape(cin, 1, 1)
    a = x.astype(jnp.float32) * f + s
    z = jnp.where(a >= 0, a, NEG_SLOPE * a)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, rows, wp), 1) + si * slab
    col = jax.lax.broadcasted_iota(jnp.int32, (1, rows, wp), 2)
    valid = ((row >= 4) & (row < h + 4) & (col >= 1) & (col < width + 1))
    return jnp.where(valid, z, 0.0)


def _bnl_fwd_kernel(x_ref, f_ref, s_ref, w_ref, o_ref, *,
                    slab, width, cin, cout, h):
    """x_ref [1, C, slab+8, W+2] PADDED raw y; w_ref [9, Cin, Cout];
    o_ref [1, Co, slab, W]."""
    si = pl.program_id(1)
    z = _prologue_z(x_ref[0], f_ref, s_ref, si=si, slab=slab,
                    width=width, cin=cin, h=h).astype(x_ref.dtype)
    acc = jnp.zeros((cout, slab * width), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            zs = z[:, _HOFF + dh:_HOFF + dh + slab, dw:dw + width]
            acc = acc + jax.lax.dot_general(
                w_ref[dh * 3 + dw], zs.reshape(cin, slab * width),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(cout, slab, width).astype(o_ref.dtype)


def _bnl_dgrad_kernel(g_ref, wr_ref, y_ref, f_ref, s_ref,
                      dy_ref, df_ref, ds_ref, *, slab, width, cin, cout,
                      h):
    """dz = conv3x3(g, w_rot); dy = dz * leaky'(a) * f; df/ds reduced
    in-kernel. g_ref [1, Co, slab+8, W+2] padded; wr_ref [9, Co, Cin];
    y_ref [1, Cin, slab, W] UNPADDED center block; dy_ref like y_ref;
    df/ds [1, Cin] f32 accumulated over the sequential grid."""
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        df_ref[...] = jnp.zeros_like(df_ref)
        ds_ref[...] = jnp.zeros_like(ds_ref)

    g = g_ref[0]
    acc = jnp.zeros((cin, slab * width), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            gs = g[:, _HOFF + dh:_HOFF + dh + slab, dw:dw + width]
            acc = acc + jax.lax.dot_general(
                wr_ref[dh * 3 + dw], gs.reshape(cout, slab * width),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    dz = acc.reshape(cin, slab, width)
    y = y_ref[0].astype(jnp.float32)
    f = f_ref[...].reshape(cin, 1, 1)
    s = s_ref[...].reshape(cin, 1, 1)
    a = y * f + s
    da = dz * jnp.where(a >= 0, 1.0, NEG_SLOPE)
    dy_ref[0] = (da * f).astype(dy_ref.dtype)
    # reduce via the rank-2 [C, slab*W] shape (the proven stats-kernel
    # pattern; rank-3 multi-axis reduces trip a Mosaic layout check)
    da2 = da.reshape(cin, slab * width)
    y2 = y.reshape(cin, slab * width)
    df_ref[...] += jnp.sum(da2 * y2, axis=1)[None]
    ds_ref[...] += jnp.sum(da2, axis=1)[None]


def _bnl_wgrad_kernel(x_ref, f_ref, s_ref, g_ref, o_ref, *,
                      slab, width, cin, cout, h):
    """dW via the im2col contraction, with z recomputed in the prologue.
    x_ref [1, Cin, slab+8, W+2] padded raw y; g_ref [1, Co, slab, W];
    o_ref [9*Cin, Cout] f32 accumulated over the sequential grid."""
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    si = pl.program_id(1)
    z = _prologue_z(x_ref[0], f_ref, s_ref, si=si, slab=slab,
                    width=width, cin=cin, h=h).astype(x_ref.dtype)
    cols = []
    for dh in range(3):
        for dw in range(3):
            zs = z[:, _HOFF + dh:_HOFF + dh + slab, dw:dw + width]
            cols.append(zs.reshape(cin, slab * width))
    zcol = jnp.concatenate(cols, axis=0)
    g = g_ref[0].reshape(cout, slab * width)
    o_ref[...] += jax.lax.dot_general(
        zcol, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _halo_spec(c, slab, width):
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(c), pl.Element(slab + 8),
         pl.Element(width + 2)),
        lambda bi, si: (bi, 0, si * slab, 0),
        memory_space=pltpu.VMEM)


def _center_spec(c, slab, width):
    return pl.BlockSpec((1, c, slab, width),
                        lambda bi, si: (bi, 0, si, 0),
                        memory_space=pltpu.VMEM)


def _vec_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _bnl_call_fwd(yp, f2, s2, wp, *, b, cin, cout, h, width, slab,
                  out_dtype, interpret):
    kernel = functools.partial(_bnl_fwd_kernel, slab=slab, width=width,
                               cin=cin, cout=cout, h=h)
    return pl.pallas_call(
        kernel,
        grid=(b, h // slab),
        in_specs=[_halo_spec(cin, slab, width), _vec_spec(), _vec_spec(),
                  _vec_spec()],
        out_specs=_center_spec(cout, slab, width),
        out_shape=jax.ShapeDtypeStruct((b, cout, h, width), out_dtype),
        interpret=interpret,
    )(yp, f2, s2, wp)


def conv3x3_bnl_reference(y, f, s, w, out_dtype=None):
    """jnp oracle / non-TPU fallback: conv3x3(leaky(y*f+s), w)."""
    a = (y.astype(jnp.float32) * f[None, :, None, None]
         + s[None, :, None, None])
    z = jnp.where(a >= 0, a, NEG_SLOPE * a).astype(y.dtype)
    out = jax.lax.conv_general_dilated(
        z, w.astype(z.dtype), (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))
    return out.astype(out_dtype or y.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def conv3x3_bnl(y: jax.Array, f: jax.Array, s: jax.Array, w: jax.Array,
                out_dtype=None, interpret: bool = False) -> jax.Array:
    """y [B,C,H,W] raw conv output, f/s [C] f32 BN factor/effective
    shift, w [3,3,C,Co] -> conv3x3_SAME(leaky(y*f+s), w) [B,Co,H,W]."""
    b, cin, h, width = y.shape
    cout = w.shape[-1]
    slab = _pick_slab(h)
    yp = jnp.pad(y, ((0, 0), (0, 0), (4, 4), (1, 1)))
    wp = w.reshape(9, cin, cout).astype(y.dtype)
    return _bnl_call_fwd(
        yp, f.reshape(cin, 1).astype(jnp.float32),
        s.reshape(cin, 1).astype(jnp.float32), wp,
        b=b, cin=cin, cout=cout, h=h, width=width, slab=slab,
        out_dtype=out_dtype or y.dtype, interpret=interpret)


def _bnl_vjp_fwd(y, f, s, w, out_dtype, interpret):
    return conv3x3_bnl(y, f, s, w, out_dtype, interpret), (y, f, s, w)


def _bnl_vjp_bwd(out_dtype, interpret, res, g):
    y, f, s, w = res
    b, cin, h, width = y.shape
    cout = w.shape[-1]
    slab = _pick_slab(h)
    g = g.astype(y.dtype)
    gp = jnp.pad(g, ((0, 0), (0, 0), (4, 4), (1, 1)))
    # w_rot[tap 3dh+dw] = w[2-dh, 2-dw] with (Co, Cin) rows
    wr = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    wr = wr.reshape(9, cout, cin).astype(y.dtype)
    f2 = f.reshape(cin, 1).astype(jnp.float32)
    s2 = s.reshape(cin, 1).astype(jnp.float32)

    dgrad = functools.partial(_bnl_dgrad_kernel, slab=slab, width=width,
                              cin=cin, cout=cout, h=h)
    dy, df, ds = pl.pallas_call(
        dgrad,
        grid=(b, h // slab),
        in_specs=[_halo_spec(cout, slab, width), _vec_spec(),
                  _center_spec(cin, slab, width), _vec_spec(), _vec_spec()],
        out_specs=[_center_spec(cin, slab, width),
                   pl.BlockSpec((1, cin), lambda bi, si: (0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, cin), lambda bi, si: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, cin, h, width), y.dtype),
                   jax.ShapeDtypeStruct((1, cin), jnp.float32),
                   jax.ShapeDtypeStruct((1, cin), jnp.float32)],
        interpret=interpret,
    )(gp, wr, y, f2, s2)

    yp = jnp.pad(y, ((0, 0), (0, 0), (4, 4), (1, 1)))  # CSE'd with fwd
    wgrad = functools.partial(_bnl_wgrad_kernel, slab=slab, width=width,
                              cin=cin, cout=cout, h=h)
    dw_flat = pl.pallas_call(
        wgrad,
        grid=(b, h // slab),
        in_specs=[_halo_spec(cin, slab, width), _vec_spec(), _vec_spec(),
                  _center_spec(cout, slab, width)],
        out_specs=pl.BlockSpec((9 * cin, cout), lambda bi, si: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9 * cin, cout), jnp.float32),
        interpret=interpret,
    )(yp, f2, s2, g)
    dw = dw_flat.reshape(3, 3, cin, cout).astype(w.dtype)
    return (dy, df[0].astype(f.dtype), ds[0].astype(s.dtype), dw)


conv3x3_bnl.defvjp(_bnl_vjp_fwd, _bnl_vjp_bwd)
