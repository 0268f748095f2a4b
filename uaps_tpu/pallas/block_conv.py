"""Fused ConvBlock chain kernels (VERDICT r3 #1 — the plateau-breaker).

The reference ConvBlock (utilities/UAPS_unet.py:31-47) is
conv1-BN-LeakyReLU-Dropout-conv2-BN-LeakyReLU. The chain path runs it
as TWO pallas programs plus [C]-sized XLA algebra:

  kernel A  (chain_conv_plain): dwnp conv + per-channel raw moments
            (sum, sumsq) emitted FREE from the f32 accumulator.
  kernel B  (chain_conv_bnl):   BN-normalize + LeakyReLU + (optional)
            dropout computed in the conv's VMEM prologue — the
            normalized/dropped tensor never touches HBM — + moments.

and ONE fused backward kernel per conv computing dgrad AND wgrad in a
single pass over the blocks (they share the g and input operands, which
the split kernels each re-read), with the prologue's mask/factor
multiplies and the df/ds reductions fused in (kernel B) — so a
ConvBlock backward is 2 pallas calls instead of 4 + XLA BN backward.

The BN moment-cotangent folds (dy_eff = dy + ds1 + 2 y ds2, the part
that made the r2 stats-VJP variant LOSE as a standalone — PERF.md) ride
the XLA pad pass that feeds each backward kernel (fused elementwise,
no extra memory pass).

Dropout uses a POSITION-HASHED bitstream (seed + absolute tensor
position -> uint32 hash), not the sequential per-core PRNG: a block's
halo rows overlap the neighbouring blocks' center rows, so the draw for
a given pixel must be identical from whichever block reads it, and the
backward regenerates the identical mask with zero residual bytes.
Same-distribution deviation from torch's RNG, like every other RNG in
the rebuild (docs/ARCHITECTURE.md).

Conv layout/blocking is exactly conv3x3_nchw.py's 'dwnp' variant
(lane-aligned full-width loads, flat output blocks, W halos as masked
f32 accumulator lane-rolls) — the measured-fastest kernel (PERF.md r2).

Non-TPU platforms use the *_reference twins: same math INCLUDING the
hash bitstream, so CPU tests pin the kernels bit-for-bit (modulo f32
accumulation order).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uaps_tpu.pallas.conv3x3_nchw import _HOFF, _pick_slab

NEG_SLOPE = 0.01  # torch LeakyReLU default (reference uses default)

# murmur3-style avalanche constants as int32 (wrapping int32 multiplies
# produce the same bits as uint32 multiplies)
_H1 = -1640531527   # 0x9E3779B9
_H2 = -2048144777   # 0x85EBCA77
_H3 = -1028477379   # 0xC2B2AE3D


def _hash_u32(pos, seed, in_kernel: bool):
    """uint32 hash of (int32 position, int32 scalar seed).

    in_kernel=True uses pltpu.bitcast (Mosaic); False uses
    lax.bitcast_convert_type (plain XLA) — identical bits either way.
    """
    bc = (pltpu.bitcast if in_kernel
          else lambda x, dt: jax.lax.bitcast_convert_type(x, dt))
    h = pos * jnp.int32(_H1) ^ seed
    hu = bc(h, jnp.uint32)
    hu = hu ^ (hu >> 15)
    hu = bc(bc(hu, jnp.int32) * jnp.int32(_H2), jnp.uint32)
    hu = hu ^ (hu >> 13)
    hu = bc(bc(hu, jnp.int32) * jnp.int32(_H3), jnp.uint32)
    return hu ^ (hu >> 16)


def _keep_mask(seed, bi, si, *, cin, h, width, slab, rate, in_kernel):
    """Bool keep-mask for a [cin, slab+8, width] halo block; hashes the
    ABSOLUTE (example, channel, true row, col) position so overlapping
    blocks and the backward draw identical bits."""
    rows = slab + 8
    shape = (cin, rows, width)
    ch = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    rr = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    cc = jax.lax.broadcasted_iota(jnp.int32, shape, 2)
    trow = si * slab + rr - 4
    pos = ((bi * cin + ch) * h + trow) * width + cc
    hu = _hash_u32(pos, seed, in_kernel)
    threshold = jnp.uint32(int((1.0 - rate) * (2 ** 32 - 1)))
    return hu <= threshold


def _keep_mask_center(seed, bi, si, *, cin, h, width, slab, rate):
    """The SAME position-hash draws as _keep_mask, but built directly on
    the flat [cin, slab*width] center domain — Mosaic rejects the
    sublane-offset slice keep[:, 4:4+slab, :] of the bool halo mask
    (on-chip probe r4), so the backward recomputes the bits instead of
    slicing them. pos = (bi*cin+ch)*h*width + (si*slab)*width + n, which
    equals the 3-D formula at the block's center rows."""
    shape = (cin, slab * width)
    ch = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    n = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    pos = ((bi * cin + ch) * h + si * slab) * width + n
    hu = _hash_u32(pos, seed, in_kernel=True)
    threshold = jnp.uint32(int((1.0 - rate) * (2 ** 32 - 1)))
    return hu <= threshold


def _prologue_z(x, f_ref, s_ref, seed_ref, bi, si, *, cin, h, width, slab,
                rate, in_kernel=True):
    """normalize + leaky + (dropout) + halo mask on a padded halo block
    [cin, slab+8, width] -> f32."""
    f = f_ref[...].reshape(cin, 1, 1)
    s = s_ref[...].reshape(cin, 1, 1)
    a = x.astype(jnp.float32) * f + s
    z = jnp.where(a >= 0, a, NEG_SLOPE * a)
    rows = slab + 8
    rr = jax.lax.broadcasted_iota(jnp.int32, (1, rows, width), 1)
    prow = si * slab + rr
    valid = (prow >= 4) & (prow < h + 4)
    if rate > 0:
        keep = _keep_mask(seed_ref[0], bi, si, cin=cin, h=h, width=width,
                          slab=slab, rate=rate, in_kernel=in_kernel)
        z = jnp.where(valid & keep, z * (1.0 / (1.0 - rate)),
                      jnp.zeros_like(z))
    else:
        z = jnp.where(valid, z, jnp.zeros_like(z))
    return z


def _dwnp_conv(xin, w_ref, *, slab, width, cin, cout):
    """The dwnp conv body: xin [cin, slab+8, width] (bf16/f32), 3 aligned
    dh slices, 9 matmuls into 3 per-dw f32 accumulators, W halos as
    masked lane-rolls. Returns flat f32 [cout, slab*width]."""
    accs = [jnp.zeros((cout, slab * width), jnp.float32) for _ in range(3)]
    for dh in range(3):
        xs = xin[:, _HOFF + dh:_HOFF + dh + slab, :]
        xr = xs.reshape(cin, slab * width)
        for dw in range(3):
            accs[dw] = accs[dw] + jax.lax.dot_general(
                w_ref[dh * 3 + dw], xr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    n = jax.lax.broadcasted_iota(jnp.int32, (cout, slab * width), 1)
    a0 = jnp.where(n % width == 0, 0.0, pltpu.roll(accs[0], 1, 1))
    a2 = jnp.where(n % width == width - 1, 0.0,
                   pltpu.roll(accs[2], slab * width - 1, 1))
    return accs[1] + a0 + a2


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _make_fwd_kernel(*, prologue, rate, slab, width, cin, cout, h):
    def kernel(*refs):
        i = 0
        seed_ref = None
        if prologue and rate > 0:
            seed_ref = refs[i]; i += 1                       # noqa: E702
        x_ref = refs[i]; i += 1                              # noqa: E702
        f_ref = s_ref = None
        if prologue:
            f_ref, s_ref = refs[i], refs[i + 1]; i += 2      # noqa: E702
        w_ref = refs[i]; i += 1                              # noqa: E702
        o_ref, s1_ref, s2_ref = refs[i], refs[i + 1], refs[i + 2]

        bi, si = pl.program_id(0), pl.program_id(1)

        @pl.when(jnp.logical_and(bi == 0, si == 0))
        def _():
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)

        x = x_ref[0]
        if prologue:
            z = _prologue_z(x, f_ref, s_ref, seed_ref, bi, si, cin=cin,
                            h=h, width=width, slab=slab, rate=rate)
            xin = z.astype(x_ref.dtype)
        else:
            xin = x
        acc = _dwnp_conv(xin, w_ref, slab=slab, width=width, cin=cin,
                         cout=cout)
        o_ref[0] = acc.astype(o_ref.dtype)
        s1_ref[...] += acc.sum(axis=1)[None]
        s2_ref[...] += (acc * acc).sum(axis=1)[None]
    return kernel


def _halo_spec_np(c, slab, width):
    """dwnp halo input: H-padded only (W stays lane-aligned)."""
    return pl.BlockSpec(
        (pl.Element(1), pl.Element(c), pl.Element(slab + 8),
         pl.Element(width)),
        lambda bi, si: (bi, 0, si * slab, 0),
        memory_space=pltpu.VMEM)


def _flat_out_spec(c, slab, width):
    return pl.BlockSpec((1, c, slab * width), lambda bi, si: (bi, 0, si),
                        memory_space=pltpu.VMEM)


def _vec_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _smem_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _stats_specs(c):
    spec = pl.BlockSpec((1, c), lambda bi, si: (0, 0),
                        memory_space=pltpu.VMEM)
    return [spec, spec]


def _chain_fwd_call(xp, w9, f, s, seed, *, prologue, rate, b, cin, cout,
                    h, width, slab, out_dtype, interpret):
    kernel = _make_fwd_kernel(prologue=prologue, rate=rate, slab=slab,
                              width=width, cin=cin, cout=cout, h=h)
    in_specs, args = [], []
    if prologue and rate > 0:
        in_specs.append(_smem_spec()); args.append(seed.reshape(1))
    in_specs.append(_halo_spec_np(cin, slab, width)); args.append(xp)
    if prologue:
        in_specs += [_vec_spec(), _vec_spec()]
        args += [f.reshape(cin, 1).astype(jnp.float32),
                 s.reshape(cin, 1).astype(jnp.float32)]
    in_specs.append(_vec_spec()); args.append(w9)
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(b, h // slab),
        in_specs=in_specs,
        out_specs=[_flat_out_spec(cout, slab, width)] + _stats_specs(cout),
        out_shape=[jax.ShapeDtypeStruct((b, cout, h * width), out_dtype),
                   jax.ShapeDtypeStruct((1, cout), jnp.float32),
                   jax.ShapeDtypeStruct((1, cout), jnp.float32)],
        interpret=interpret,
    )(*args)
    return y.reshape(b, cout, h, width), s1[0], s2[0]


# ---------------------------------------------------------------------------
# fused dgrad+wgrad backward kernels
# ---------------------------------------------------------------------------

def _make_bwd_kernel(*, prologue, rate, slab, width, cin, cout, h):
    """One pass per block computing BOTH
      dx  = convT(ge, w_rot) [* leaky' * f through the prologue]
      dW  = wgrad(z, ge)          (z = prologue(x) or x itself)
    plus df/ds reductions when prologue. Refs in order:
      [seed], g(HALO cout), x(HALO cin), [f, s], wr ->
      dx(flat cin), dw [9,cin,cout], [df, ds]"""
    def kernel(*refs):
        i = 0
        seed_ref = None
        if prologue and rate > 0:
            seed_ref = refs[i]; i += 1                       # noqa: E702
        g_ref = refs[i]; i += 1                              # noqa: E702
        x_ref = refs[i]; i += 1                              # noqa: E702
        f_ref = s_ref = None
        if prologue:
            f_ref, s_ref = refs[i], refs[i + 1]; i += 2      # noqa: E702
        wr_ref = refs[i]; i += 1                             # noqa: E702
        dx_ref, dw_ref = refs[i], refs[i + 1]
        df_ref = ds_ref = None
        if prologue:
            df_ref, ds_ref = refs[i + 2], refs[i + 3]

        bi, si = pl.program_id(0), pl.program_id(1)

        @pl.when(jnp.logical_and(bi == 0, si == 0))
        def _():
            dw_ref[...] = jnp.zeros_like(dw_ref)
            if prologue:
                df_ref[...] = jnp.zeros_like(df_ref)
                ds_ref[...] = jnp.zeros_like(ds_ref)

        g = g_ref[0]                        # [cout, slab+8, width] padded
        # ---- dgrad: dz = convT(g, w_rot), dwnp structure ----
        dz = _dwnp_conv(g, wr_ref, slab=slab, width=width, cin=cout,
                        cout=cin)           # [cin, slab*width] f32

        x = x_ref[0]
        if prologue:
            keep = None
            if rate > 0:
                keep = _keep_mask(seed_ref[0], bi, si, cin=cin, h=h,
                                  width=width, slab=slab, rate=rate,
                                  in_kernel=True)
            f = f_ref[...].reshape(cin, 1)
            s = s_ref[...].reshape(cin, 1)
            xc = x[:, 4:4 + slab, :].reshape(
                cin, slab * width).astype(jnp.float32)
            a = xc * f + s
            dl = dz
            if rate > 0:
                kc = _keep_mask_center(seed_ref[0], bi, si, cin=cin, h=h,
                                       width=width, slab=slab, rate=rate)
                dl = jnp.where(kc, dl * (1.0 / (1.0 - rate)),
                               jnp.zeros_like(dl))
            da = dl * jnp.where(a >= 0, 1.0, NEG_SLOPE)
            dx_ref[0] = (da * f).astype(dx_ref.dtype)
            df_ref[...] += jnp.sum(da * xc, axis=1)[None]
            ds_ref[...] += jnp.sum(da, axis=1)[None]
            # z for wgrad: recompute the prologue on the halo block
            af = x.astype(jnp.float32) * f.reshape(cin, 1, 1) \
                + s.reshape(cin, 1, 1)
            z3 = jnp.where(af >= 0, af, NEG_SLOPE * af)
            rows = slab + 8
            rr = jax.lax.broadcasted_iota(jnp.int32, (1, rows, width), 1)
            prow = si * slab + rr
            valid = (prow >= 4) & (prow < h + 4)
            if rate > 0:
                z3 = jnp.where(valid & keep, z3 * (1.0 / (1.0 - rate)),
                               jnp.zeros_like(z3))
            else:
                z3 = jnp.where(valid, z3, jnp.zeros_like(z3))
            z = z3.astype(x_ref.dtype)
        else:
            dx_ref[0] = dz.astype(dx_ref.dtype)
            z = x

        # ---- wgrad: dW[dh,dw] = sum z[.,shifted] * g_center ----
        gc = g[:, 4:4 + slab, :].reshape(cout, slab * width)
        gf = gc.astype(jnp.float32)
        n = jax.lax.broadcasted_iota(jnp.int32, gf.shape, 1)
        # dw=0 tap: dW += sum_n z[n] g[n+1]
        g0 = jnp.where(n % width == width - 1, 0.0,
                       pltpu.roll(gf, slab * width - 1, 1)).astype(gc.dtype)
        # dw=2 tap: dW += sum_n z[n] g[n-1]
        g2 = jnp.where(n % width == 0, 0.0,
                       pltpu.roll(gf, 1, 1)).astype(gc.dtype)
        gs = (g0, gc, g2)
        for dh in range(3):
            zs = z[:, _HOFF + dh:_HOFF + dh + slab, :].reshape(
                cin, slab * width)
            for dw in range(3):
                dw_ref[dh * 3 + dw] += jax.lax.dot_general(
                    zs, gs[dw], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dw_ref.dtype)
    return kernel


def _chain_bwd_call(gep, xp, wr9, f, s, seed, *, prologue, rate, b, cin,
                    cout, h, width, slab, dx_dtype, interpret):
    kernel = _make_bwd_kernel(prologue=prologue, rate=rate, slab=slab,
                              width=width, cin=cin, cout=cout, h=h)
    in_specs, args = [], []
    if prologue and rate > 0:
        in_specs.append(_smem_spec()); args.append(seed.reshape(1))
    in_specs.append(_halo_spec_np(cout, slab, width)); args.append(gep)
    in_specs.append(_halo_spec_np(cin, slab, width)); args.append(xp)
    if prologue:
        in_specs += [_vec_spec(), _vec_spec()]
        args += [f.reshape(cin, 1).astype(jnp.float32),
                 s.reshape(cin, 1).astype(jnp.float32)]
    in_specs.append(_vec_spec()); args.append(wr9)
    out_specs = [_flat_out_spec(cin, slab, width),
                 pl.BlockSpec((9, cin, cout), lambda bi, si: (0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, cin, h * width), dx_dtype),
                 jax.ShapeDtypeStruct((9, cin, cout), jnp.float32)]
    if prologue:
        out_specs += _stats_specs(cin)
        out_shape += [jax.ShapeDtypeStruct((1, cin), jnp.float32),
                      jax.ShapeDtypeStruct((1, cin), jnp.float32)]
    outs = pl.pallas_call(
        kernel,
        grid=(b, h // slab),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    dx = outs[0].reshape(b, cin, h, width)
    dw = outs[1].reshape(3, 3, cin, cout)
    if prologue:
        return dx, dw, outs[2][0], outs[3][0]
    return dx, dw


def _pad_h(x):
    return jnp.pad(x, ((0, 0), (0, 0), (4, 4), (0, 0)))


def _rot9(w, dtype):
    """[3,3,ci,co] -> rotated taps [9, co, ci] for the transposed conv."""
    wr = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    return wr.reshape(9, w.shape[3], w.shape[2]).astype(dtype)


def _fold(g, y, ds1, ds2, dtype):
    """Moment-cotangent fold dy_eff = dy + ds1 + 2 y ds2 — elementwise,
    fused by XLA into the pad that feeds the backward kernel."""
    return (g.astype(jnp.float32)
            + ds1.astype(jnp.float32)[None, :, None, None]
            + 2.0 * y.astype(jnp.float32)
            * ds2.astype(jnp.float32)[None, :, None, None]).astype(dtype)


# ---------------------------------------------------------------------------
# public ops (custom VJP)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def chain_conv_plain(x: jax.Array, w: jax.Array, interpret: bool = False):
    """x [B,Cin,H,W], w [3,3,Cin,Cout] -> (y [B,Cout,H,W] raw conv
    (NO bias), s1 [Cout], s2 [Cout] f32 moments of raw y over B,H,W).
    SAME, stride 1. The VJP folds the moment cotangents into dy inside
    the XLA pad pass and runs ONE fused dgrad+wgrad kernel."""
    b, cin, h, width = x.shape
    cout = w.shape[-1]
    return _chain_fwd_call(
        _pad_h(x), w.reshape(9, cin, cout).astype(x.dtype), None, None,
        None, prologue=False, rate=0.0, b=b, cin=cin, cout=cout, h=h,
        width=width, slab=_pick_slab(h), out_dtype=x.dtype,
        interpret=interpret)


def _plain_fwd(x, w, interpret):
    b, cin, h, width = x.shape
    cout = w.shape[-1]
    xp = _pad_h(x)
    y, s1, s2 = _chain_fwd_call(
        xp, w.reshape(9, cin, cout).astype(x.dtype), None, None, None,
        prologue=False, rate=0.0, b=b, cin=cin, cout=cout, h=h,
        width=width, slab=_pick_slab(h), out_dtype=x.dtype,
        interpret=interpret)
    return (y, s1, s2), (xp, w, y)


def _plain_bwd(interpret, res, cts):
    xp, w, y = res
    g, ds1, ds2 = cts
    b, cout, h, width = g.shape
    cin = w.shape[2]
    gep = _pad_h(_fold(g, y, ds1, ds2, y.dtype))
    dx, dw = _chain_bwd_call(
        gep, xp, _rot9(w, y.dtype), None, None, None, prologue=False,
        rate=0.0, b=b, cin=cin, cout=cout, h=h, width=width,
        slab=_pick_slab(h), dx_dtype=y.dtype, interpret=interpret)
    return dx, dw.astype(w.dtype)


chain_conv_plain.defvjp(_plain_fwd, _plain_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def chain_conv_bnl(x: jax.Array, f: jax.Array, s: jax.Array,
                   w: jax.Array, seed: jax.Array, rate: float = 0.0,
                   interpret: bool = False):
    """x [B,C,H,W] RAW previous-conv output; f/s [C] f32 BN
    factor/effective-shift (bias folded — see BNFactorShift);
    seed int32 scalar; rate static dropout prob.

    Computes conv3x3_SAME(dropout(leaky(x*f+s)), w) with the whole
    prologue in VMEM, plus raw-output moments. Dropout mask is
    position-hashed (regenerated in the VJP, zero residual)."""
    b, cin, h, width = x.shape
    cout = w.shape[-1]
    return _chain_fwd_call(
        _pad_h(x), w.reshape(9, cin, cout).astype(x.dtype), f, s, seed,
        prologue=True, rate=rate, b=b, cin=cin, cout=cout, h=h,
        width=width, slab=_pick_slab(h), out_dtype=x.dtype,
        interpret=interpret)


def _bnl_fwd(x, f, s, w, seed, rate, interpret):
    b, cin, h, width = x.shape
    cout = w.shape[-1]
    xp = _pad_h(x)
    y, s1, s2 = _chain_fwd_call(
        xp, w.reshape(9, cin, cout).astype(x.dtype), f, s, seed,
        prologue=True, rate=rate, b=b, cin=cin, cout=cout, h=h,
        width=width, slab=_pick_slab(h), out_dtype=x.dtype,
        interpret=interpret)
    return (y, s1, s2), (xp, f, s, w, seed, y)


def _bnl_bwd(rate, interpret, res, cts):
    xp, f, s, w, seed, y = res
    g, ds1, ds2 = cts
    b, cout, h, width = g.shape
    cin = w.shape[2]
    gep = _pad_h(_fold(g, y, ds1, ds2, y.dtype))
    dx, dw, df, ds = _chain_bwd_call(
        gep, xp, _rot9(w, y.dtype), f, s, seed, prologue=True, rate=rate,
        b=b, cin=cin, cout=cout, h=h, width=width, slab=_pick_slab(h),
        dx_dtype=y.dtype, interpret=interpret)
    return (dx, df.astype(f.dtype), ds.astype(s.dtype),
            dw.astype(w.dtype), None)


chain_conv_bnl.defvjp(_bnl_fwd, _bnl_bwd)


# ---------------------------------------------------------------------------
# jnp reference twins (non-TPU platforms; identical math incl. the
# dropout bitstream, so CPU training matches the kernels)
# ---------------------------------------------------------------------------

def _conv_nchw(x, w):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NCHW", "HWIO", "NCHW"))


def _moments(y):
    yf = y.astype(jnp.float32)
    return yf.sum(axis=(0, 2, 3)), (yf * yf).sum(axis=(0, 2, 3))


def chain_ref_plain(x, w):
    y = _conv_nchw(x, w)
    s1, s2 = _moments(y)
    return y, s1, s2


def hash_keep_ref(seed, shape, rate):
    """The position-hash keep mask over a full [B,C,H,W] tensor (plain
    XLA) — bit-identical to the kernels' in-block draws."""
    b, c, h, w = shape
    pos = jnp.arange(b * c * h * w, dtype=jnp.int32).reshape(shape)
    hu = _hash_u32(pos, seed.astype(jnp.int32), in_kernel=False)
    threshold = jnp.uint32(int((1.0 - rate) * (2 ** 32 - 1)))
    return hu <= threshold


def chain_ref_bnl(x, f, s, w, seed, rate=0.0):
    a = (x.astype(jnp.float32) * f[None, :, None, None]
         + s[None, :, None, None])
    z = jnp.where(a >= 0, a, NEG_SLOPE * a)
    if rate > 0:
        keep = hash_keep_ref(seed, x.shape, rate)
        z = jnp.where(keep, z * (1.0 / (1.0 - rate)), jnp.zeros_like(z))
    y = _conv_nchw(z.astype(x.dtype), w)
    s1, s2 = _moments(y)
    return y, s1, s2
