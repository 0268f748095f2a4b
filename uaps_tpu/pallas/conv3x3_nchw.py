"""Channels-in-sublanes 3x3 conv kernel (the small-channel fast path).

The NHWC implicit-GEMM kernel (conv3x3.py) is bound by VMEM channel
padding: with C=16 in the lane dimension every copy pays 128/16 = 8x. This
variant keeps SPATIAL dims in the (sublane, lane) tile — [C, H, W] blocks
— so buffers are unpadded, and contracts channels with nine tiny
[Co, C] x [C, slab*W] MXU matmuls (N = slab*W fills all 128 lanes; the
C=16 contraction is the only short dimension).

API: conv3x3_nchw(x_nchw [B, C, H, W], w [3, 3, Cin, Cout]) ->
[B, Cout, H, W]. `conv3x3_fast` wraps it NHWC-to-NHWC with boundary
transposes and a custom VJP (dgrad = same kernel with flipped/IO-swapped
weights; wgrad = accumulating kernel).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_slab(h: int) -> int:
    """Rows per grid cell. 64 amortizes the per-matmul fixed cost and
    the roll epilogue better than 32 (r5d step A/B: 64.7 -> 63.1
    ms/step with the override applied to every kernel); 128 would push
    the [3Co, slab*W] f32 accumulator past scoped VMEM."""
    for s in (64, 32, 16, 8):
        if h % s == 0:
            return s
    return h


# Mosaic requires the block's last two dims divisible by (8, 128) or equal
# to the array dims: H-halo blocks are slab+8 rows (true halo needs slab+2;
# rows are loaded at offset si*slab into an H+8-padded array, so the valid
# window starts at block-relative row 3), and the W dim is carried at full
# padded width.
_HOFF = 3  # block-relative row of true row si*slab - 1

# every selectable kernel variant; a typo'd UAPS_CONV_VARIANT must error,
# not silently run 'taps' labeled as something else
VARIANTS = frozenset(
    {"taps", "im2col", "dhdw", "flat", "dwout", "dwnp", "dwm", "dwmf",
     "fullh"})

# Experiment knobs, read ONCE at import (A/B harnesses run one config
# per process): UAPS_CONV_DIMSEM=1 marks the fwd grid dims parallel
# (every (bi, si) output block is independent); UAPS_CONV_INFUSE=1 asks
# Mosaic to fuse the x producer (the feeding jnp.pad) into the kernel's
# input pipeline instead of materializing the padded tensor in HBM.
import os as _os  # noqa: E402
_DIMSEM = _os.environ.get("UAPS_CONV_DIMSEM", "0") == "1"
_INFUSE = _os.environ.get("UAPS_CONV_INFUSE", "0") == "1"


def _fwd_compiler_params():
    if not (_DIMSEM or _INFUSE):
        return None
    return pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel") if _DIMSEM else None,
        allow_input_fusion=[True, False] if _INFUSE else None)


def _wgrad_compiler_params():
    # wgrad accumulates over the sequential grid -> dims stay arbitrary
    if not _INFUSE:
        return None
    return pltpu.CompilerParams(allow_input_fusion=[True, False])


def _fwd_kernel(x_ref, w_ref, o_ref, *, slab, width, cin, cout):
    """x_ref [1, C, slab+8, W+2], w_ref [9, Cin, Cout],
    o_ref [1, Co, slab, W]."""
    x = x_ref[0]
    acc = jnp.zeros((cout, slab * width), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            xs = x[:, _HOFF + dh:_HOFF + dh + slab, dw:dw + width]
            xr = xs.reshape(cin, slab * width)
            k = w_ref[dh * 3 + dw]                        # [Cin, Cout]
            acc = acc + jax.lax.dot_general(
                k, xr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # [Co, slab*W]
    o_ref[0] = acc.reshape(cout, slab, width).astype(o_ref.dtype)


def _fwd_kernel_dwout(x_ref, w_ref, o_ref, *, slab, width, cin, cout,
                      wpad=1):
    """x_ref [1, C, slab+8, W+2*wpad], w_ref [9, Cin, Cout],
    o_ref [1, Co, slab*W] (FLAT output block).

    r2 anatomy (scripts/tpu_conv_anatomy.py): of taps' 0.42 ms/call,
    ~0.12 is the nine shifted-slice relayouts and the rest DMA+matmuls.
    This kernel slices only per dh (THREE center slices), accumulates
    per-dw partials, and applies the dw=0/2 column offsets as two masked
    f32 lane-rolls of the partials: y[j] += A_dw[j + dw - 1], where the
    roll wrap crosses a row boundary exactly at the zero-masked padded
    columns. Output stays flat [Co, slab*W] — the [B,Co,H,W] view of the
    [B,Co,H*W] result is a bitcast, so the acc->3D write relayout also
    disappears.

    With wpad=0 (the 'dwnp' variant) the input array carries NO W
    padding at all: the dh slices are lane-ALIGNED full-width loads
    (W=256 is exactly two 128-lane tiles vs the 258-lane padded rows),
    so both the slice relayouts and the odd-width DMA disappear."""
    x = x_ref[0]
    accs = [jnp.zeros((cout, slab * width), jnp.float32) for _ in range(3)]
    for dh in range(3):
        xs = x[:, _HOFF + dh:_HOFF + dh + slab, wpad:wpad + width]
        xr = xs.reshape(cin, slab * width)
        for dw in range(3):
            accs[dw] = accs[dw] + jax.lax.dot_general(
                w_ref[dh * 3 + dw], xr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    n = jax.lax.broadcasted_iota(jnp.int32, (cout, slab * width), 1)
    a0 = jnp.where(n % width == 0, 0.0, pltpu.roll(accs[0], 1, 1))
    a2 = jnp.where(n % width == width - 1, 0.0,
                   pltpu.roll(accs[2], slab * width - 1, 1))  # roll by -1
    o_ref[0] = (accs[1] + a0 + a2).astype(o_ref.dtype)


def _fwd_kernel_dwm(x_ref, w_ref, o_ref, *, slab, width, cin, cout,
                    co_out=None):
    """x_ref [1, C, slab+8, W] (NO W pad — dwnp loads), w_ref
    [3, 3*Cout, Cin] (row dw*Co+co), o_ref [1, Co, slab*W] (flat).
    co_out < cout writes only the leading real rows (Cout zero-padded
    to an 8-multiple so the dw partial slices stay sublane-aligned).

    dwnp body with the three per-dw matmuls of each dh PACKED INTO
    MATMUL M: MXU time scales with K*N*ceil(M/128) (measured r2,
    _fwd_kernel_dhdw note), so one [3Co, C] x [C, N] matmul computes
    all three dw partials for the SAME cycles as one of dwnp's nine —
    3 matmuls/block instead of 9, no new operand materialization (the
    dh slices and the masked-roll epilogue are exactly dwnp's; the
    partials come apart as cheap f32 sublane slices). r4 follow-up to
    the wgrad anatomy's matmul-count finding (docs/PERF.md)."""
    x = x_ref[0]
    accs = [jnp.zeros((cout, slab * width), jnp.float32) for _ in range(3)]
    for dh in range(3):
        xs = x[:, _HOFF + dh:_HOFF + dh + slab, :]
        xr = xs.reshape(cin, slab * width)
        p = jax.lax.dot_general(
            w_ref[dh], xr, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [3Co, slab*W]
        for dw in range(3):
            accs[dw] = accs[dw] + p[dw * cout:(dw + 1) * cout]
    n = jax.lax.broadcasted_iota(jnp.int32, (cout, slab * width), 1)
    a0 = jnp.where(n % width == 0, 0.0, pltpu.roll(accs[0], 1, 1))
    a2 = jnp.where(n % width == width - 1, 0.0,
                   pltpu.roll(accs[2], slab * width - 1, 1))
    comb = accs[1] + a0 + a2
    if co_out is not None and co_out != cout:
        comb = comb[:co_out]
    o_ref[0] = comb.astype(o_ref.dtype)


def _fwd_kernel_dwmf(x_ref, w_ref, o_ref, *, slab, width, cin, cout,
                     co_out=None):
    """x_ref [1, C, (slab+8)*W] — the FLAT lane view of the H-padded
    no-W-pad input — w_ref [3, 3*Cout, Cin], o_ref [1, Co, slab*W].

    dwm with the in-kernel sublane→lane relayout removed: slicing
    [C, slab, W] rows out of a 3-D block and reshaping to [C, slab*W]
    redistributes sublanes into lanes on every dh slice. On the flat
    view each dh slice is a LANE slice at offset (3+dh)*W — a multiple
    of 128 for any W%128==0 — so the matmul operand is an aligned tile
    extraction with no data movement. Rolls/epilogue exactly dwm's."""
    x = x_ref[0]
    accs = [jnp.zeros((cout, slab * width), jnp.float32) for _ in range(3)]
    for dh in range(3):
        xr = x[:, (_HOFF + dh) * width:(_HOFF + dh) * width + slab * width]
        p = jax.lax.dot_general(
            w_ref[dh], xr, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [3Co, slab*W]
        for dw in range(3):
            accs[dw] = accs[dw] + p[dw * cout:(dw + 1) * cout]
    n = jax.lax.broadcasted_iota(jnp.int32, (cout, slab * width), 1)
    a0 = jnp.where(n % width == 0, 0.0, pltpu.roll(accs[0], 1, 1))
    a2 = jnp.where(n % width == width - 1, 0.0,
                   pltpu.roll(accs[2], slab * width - 1, 1))
    comb = accs[1] + a0 + a2
    if co_out is not None and co_out != cout:
        comb = comb[:co_out]
    o_ref[0] = comb.astype(o_ref.dtype)


def _fwd_kernel_dwkf(x_ref, w_ref, o_ref, *, slab, width, cin, cout,
                     co_out=None):
    """dwmf with the dh taps ALSO packed — into matmul K: ONE
    [3Co, 3C] x [3C, N] matmul per grid cell instead of dwmf's three
    (K 16->48 streams the same total rows, but two matmul issues and
    their pipeline fills disappear). X3 stacks the three ALIGNED lane
    extracts on sublanes at offsets {0, C, 2C} (C is 8-multiple for
    every island shape); w_ref is WK[dw*Co+co, dh*C+c]. Epilogue
    exactly dwm's. r5 experiment (UAPS_DWK=1)."""
    x = x_ref[0]
    x3 = jnp.concatenate(
        [x[:, (_HOFF + dh) * width:(_HOFF + dh) * width + slab * width]
         for dh in range(3)], axis=0)                  # [3C, N]
    p = jax.lax.dot_general(
        w_ref[...], x3, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [3Co, N]
    accs = [p[dw * cout:(dw + 1) * cout] for dw in range(3)]
    n = jax.lax.broadcasted_iota(jnp.int32, (cout, slab * width), 1)
    a0 = jnp.where(n % width == 0, 0.0, pltpu.roll(accs[0], 1, 1))
    a2 = jnp.where(n % width == width - 1, 0.0,
                   pltpu.roll(accs[2], slab * width - 1, 1))
    comb = accs[1] + a0 + a2
    if co_out is not None and co_out != cout:
        comb = comb[:co_out]
    o_ref[0] = comb.astype(o_ref.dtype)


def _fwd_kernel_flat(x_ref, w_ref, o_ref, *, slab, width, cin, cout):
    """taps body with the FLAT [Co, slab*W] output block (no acc->3D
    write relayout); ablation point between taps and dwout."""
    x = x_ref[0]
    acc = jnp.zeros((cout, slab * width), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            xs = x[:, _HOFF + dh:_HOFF + dh + slab, dw:dw + width]
            acc = acc + jax.lax.dot_general(
                w_ref[dh * 3 + dw], xs.reshape(cin, slab * width),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def _im2col(x, *, slab, width, cin):
    """[C, slab+8, W+2] halo block -> [9*Cin, slab*W] patch matrix.

    The nine tap slices are the same loads the nine-matmul kernel issues;
    concatenating them along the sublane axis turns the channel contraction
    (K = Cin, at most 64/128 of the MXU's depth) into K = 9*Cin, so one
    matmul replaces nine and the systolic array runs ~full depth."""
    cols = []
    for dh in range(3):
        for dw in range(3):
            xs = x[:, _HOFF + dh:_HOFF + dh + slab, dw:dw + width]
            cols.append(xs.reshape(cin, slab * width))
    return jnp.concatenate(cols, axis=0)


def _fwd_kernel_im2col(x_ref, w_ref, o_ref, *, slab, width, cin, cout):
    """x_ref [1, C, slab+8, W+2], w_ref [Cout, 9*Cin],
    o_ref [1, Co, slab, W]. One [Co, 9C] x [9C, slab*W] MXU matmul."""
    xcol = _im2col(x_ref[0], slab=slab, width=width, cin=cin)
    acc = jax.lax.dot_general(
        w_ref[...], xcol, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)               # [Co, slab*W]
    o_ref[0] = acc.reshape(cout, slab, width).astype(o_ref.dtype)


def _dw_cols(x, *, slab, width, cin, rows):
    """[C, slab+8, W+2] halo block -> [3C, rows, W]: the three dw-shifted
    row windows stacked on the sublane axis (rows = slab+2 starting at the
    top halo row). Three lane shifts instead of the taps kernel's nine."""
    return jnp.concatenate(
        [x[:, _HOFF:_HOFF + rows, dw:dw + width] for dw in range(3)], axis=0)


def _fwd_kernel_dhdw(x_ref, w_ref, o_ref, *, slab, width, cin, cout):
    """dh-in-M / dw-in-K conv: x_ref [1, C, slab+8, W+2],
    w_ref [3*Cout, 3*Cin] (rows dh*Co+co, cols dw*C+c),
    o_ref [1, Co, slab, W].

    MXU time on this hardware scales with K * N * ceil(M/128) (measured:
    nine K=C matmuls == one K=9C matmul), so the only way to cut passes is
    to grow M. Packing the three dh taps into M and the three dw taps into
    K gives one [3Co, 3C] x [3C, (slab+2)W] matmul — 2.8x fewer MXU cycles
    than the nine-matmul 'taps' kernel for Cin=Cout=16 — plus a cheap
    epilogue of two sublane-shifted adds:
      y[co, r, :] = sum_dh P[dh, co, r + dh, :]."""
    rows = slab + 2
    xcol = _dw_cols(x_ref[0], slab=slab, width=width, cin=cin, rows=rows)
    p = jax.lax.dot_general(
        w_ref[...], xcol.reshape(3 * cin, rows * width),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)        # [3Co, (slab+2)*W]
    p = p.reshape(3, cout, rows, width)
    acc = (p[0, :, 0:slab] + p[1, :, 1:slab + 1] + p[2, :, 2:slab + 2])
    o_ref[0] = acc.astype(o_ref.dtype)


def conv3x3_nchw(x: jax.Array, w: jax.Array,
                 interpret: bool = False,
                 variant: str = "taps",
                 out_dtype=None, prepadded: bool = False,
                 hw=None) -> jax.Array:
    """x [B, Cin, H, W], w [3, 3, Cin, Cout] -> [B, Cout, H, W]
    (SAME, stride 1). variant: 'im2col' (one full-depth MXU matmul) or
    'taps' (nine K=Cin matmuls, the default). out_dtype lets bf16 inputs
    produce f32 outputs straight from the f32 accumulator (the logits
    head: full output precision at bf16 DMA/matmul cost — the f32-in
    out_conv was profiled at 0.9 ms/call vs ~0.45 for bf16-in).

    FLAT mode (r5): a 3-D x [B, Cin, H*W] with hw=(H, W) is the kernels'
    native flat lane view (C in sublanes) — variant must be 'dwmf' and
    the result stays flat [B, Cout, H*W]. The 4-D<->flat boundary
    reshapes are genuine relayouts (H moves between sublanes and lanes;
    profiled 7.17 ms/step at r5a), so blocks that chain convs keep the
    flat layout end-to-end (ConvBlock flat island)."""
    if variant not in VARIANTS:
        raise ValueError(f"unknown conv variant {variant!r}; "
                         f"expected one of {sorted(VARIANTS)}")
    flat_io = x.ndim == 3
    if flat_io:
        assert hw is not None and variant == "dwmf", (variant, hw)
        h, width = hw
        b, cin = x.shape[:2]
    if variant == "fullh":
        # fullh does its own (H-only) padding and writes x.dtype outputs:
        # strip any caller pre-padding and convert afterwards (the variant
        # is env-selectable from Conv3x3, which may pass either flag)
        if prepadded:
            x = x[:, :, 4:-4, 1:-1]
        y = conv3x3_nchw_fullh(x, w, interpret)
        return y if out_dtype in (None, y.dtype) else y.astype(out_dtype)
    if not flat_io:
        b, cin, h, width = x.shape
    cout = w.shape[-1]
    copad = 0
    if variant in ("dwm", "dwmf") and cout % 8 != 0:
        # the per-dw partials come apart as f32 sublane slices at
        # offsets {0, Co, 2Co}: a non-8-multiple Co (the n_cls logits
        # heads) would force sublane relayouts. r5: zero-pad Cout in the
        # PACKED WEIGHT to the next 8-multiple so the offsets are
        # aligned; the kernel computes [3*co8, N] partials and writes
        # only the real rows. This unlocks the 3x matmul-count win for
        # the Co=4 heads (profiled 7.96 ms/24 head calls at r5a).
        # UAPS_HEAD_COPAD=0 restores the r4 dwnp fallback for A/Bs.
        if os.environ.get("UAPS_HEAD_COPAD", "1") == "0":
            variant = "dwnp"
        else:
            copad = (-cout) % 8
    wpad = 0 if variant in ("dwnp", "dwm", "dwmf") else 1
    if prepadded and not flat_io:
        h, width = h - 8, width - 2 * wpad
    out_dtype = out_dtype or x.dtype
    slab = _pick_slab(h)
    if flat_io:
        # lane-pad 4 rows of W on each side == the 4-D (4,4) H pad
        xp = x if prepadded else jnp.pad(
            x, ((0, 0), (0, 0), (4 * width, 4 * width)))
    else:
        xp = x if prepadded else jnp.pad(
            x, ((0, 0), (0, 0), (4, 4), (wpad, wpad)))
    if variant in ("dwm", "dwmf"):
        co8 = cout + copad
        wsrc = (w if copad == 0 else
                jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, copad))))
        if variant == "dwmf" and os.environ.get("UAPS_DWK", "1") == "1":
            # dh-in-K (r5f DEFAULT): WK[dw*Co8+co, dh*C+c] = w[dh,dw,c,co]
            # — one [3Co,3C]x[3C,N] matmul per grid cell instead of
            # three K=C ones. Full-step A/B measured 63.5 -> 53.3
            # ms/step: at K=16 the MXU pipeline fill dominates, so
            # matmul COUNT is what costs (the r4b wgrad-anatomy lesson
            # applied to the forward). UAPS_DWK=0 restores 3-matmul dwmf.
            wp = wsrc.transpose(1, 3, 0, 2).reshape(
                3 * co8, 3 * cin).astype(x.dtype)
            body = _fwd_kernel_dwkf
        else:
            # W3[dh][dw*Co8+co, c] = w[dh, dw, c, co] (co8 = Co + copad)
            wp = wsrc.transpose(0, 1, 3, 2).reshape(
                3, 3 * co8, cin).astype(x.dtype)
            body = (_fwd_kernel_dwmf if variant == "dwmf"
                    else _fwd_kernel_dwm)
        kernel = functools.partial(body, slab=slab,
                                   width=width, cin=cin, cout=co8,
                                   co_out=cout)
    elif variant == "dhdw":
        # W2[dh*Co+co, dw*C+c] = w[dh, dw, c, co]
        wp = w.transpose(0, 3, 1, 2).reshape(3 * cout, 3 * cin).astype(
            x.dtype)
        kernel = functools.partial(_fwd_kernel_dhdw, slab=slab,
                                   width=width, cin=cin, cout=cout)
    elif variant == "im2col":
        wp = w.reshape(9 * cin, cout).T.astype(x.dtype)
        kernel = functools.partial(_fwd_kernel_im2col, slab=slab,
                                   width=width, cin=cin, cout=cout)
    else:
        wp = w.reshape(9, cin, cout).astype(x.dtype)
        body = {"dwout": _fwd_kernel_dwout,
                "flat": _fwd_kernel_flat}.get(variant, _fwd_kernel)
        kernel = functools.partial(body, slab=slab, width=width,
                                   cin=cin, cout=cout)
        if variant == "dwnp":
            kernel = functools.partial(_fwd_kernel_dwout, slab=slab,
                                       width=width, cin=cin, cout=cout,
                                       wpad=0)
    if variant in ("dwout", "flat", "dwnp", "dwm", "dwmf"):
        # flat output block: [B, Co, H*W] viewed as [B, Co, H, W] at the
        # end is a bitcast — kills the in-kernel acc->3D write relayout
        out_specs = pl.BlockSpec((1, cout, slab * width),
                                 lambda bi, si: (bi, 0, si),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, cout, h * width), out_dtype)
    else:
        out_specs = pl.BlockSpec((1, cout, slab, width),
                                 lambda bi, si: (bi, 0, si, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, cout, h, width), out_dtype)
    if variant == "dwmf":
        # feed the FLAT lane view; every in-kernel dh slice becomes an
        # aligned lane slice. (In 4-D mode the boundary reshape is a
        # relayout XLA materializes — flat_io callers avoid it by
        # keeping the flat layout across the whole block.)
        if not flat_io:
            xp = xp.reshape(b, cin, (h + 8) * width)
        in_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(cin),
             pl.Element((slab + 8) * width)),
            lambda bi, si: (bi, 0, si * slab * width),
            memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec(
            (pl.Element(1), pl.Element(cin), pl.Element(slab + 8),
             pl.Element(width + 2 * wpad)),
            lambda bi, si: (bi, 0, si * slab, 0),
            memory_space=pltpu.VMEM)
    y = pl.pallas_call(
        kernel,
        grid=(b, h // slab),
        in_specs=[in_spec, pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=_fwd_compiler_params(),
    )(xp, wp)
    if flat_io:
        return y  # already [B, Cout, H*W]
    return y.reshape(b, cout, h, width)


def _wgrad_kernel(x_ref, g_ref, o_ref, *, slab, width, cin, cout):
    """x_ref [1, Cin, slab+8, W+2], g_ref [1, Co, slab, W],
    o_ref [9, Cin, Cout] accumulated over the sequential grid."""
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[0]
    g = g_ref[0].reshape(cout, slab * width)
    for dh in range(3):
        for dw in range(3):
            xs = x[:, _HOFF + dh:_HOFF + dh + slab,
                   dw:dw + width].reshape(cin, slab * width)
            # dW[tap, ci, co] = sum_n xs[ci, n] g[co, n]
            o_ref[dh * 3 + dw] += jax.lax.dot_general(
                xs, g, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(o_ref.dtype)


def _wgrad_kernel_im2col(x_ref, g_ref, o_ref, *, slab, width, cin, cout):
    """x_ref [1, Cin, slab+8, W+2], g_ref [1, Co, slab, W],
    o_ref [9*Cin, Cout] accumulated over the sequential grid.
    One [9C, N] x [N, Co] matmul per block instead of nine."""
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    xcol = _im2col(x_ref[0], slab=slab, width=width, cin=cin)
    g = g_ref[0].reshape(cout, slab * width)
    o_ref[...] += jax.lax.dot_general(
        xcol, g, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _wgrad_kernel_dhdw(x_ref, g_ref, o_ref, *, slab, width, cin, cout):
    """x_ref [1, Cin, slab+8, W+2], g_ref [1, Co, slab, W],
    o_ref [3*Cout, 3*Cin] accumulated over the sequential grid.
    dW2[dh*Co+co, dw*C+c] = sum_{i,j} g[co,i,j] x[c,i+dh-1,j+dw-1]:
    stack g at row offset dh per dh-group (sublane placement, cheap) and
    contract against the dw-stacked input columns in ONE matmul."""
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    rows = slab + 2
    xcol = _dw_cols(x_ref[0], slab=slab, width=width, cin=cin, rows=rows)
    g = g_ref[0]
    g2 = jnp.concatenate(
        [jnp.pad(g, ((0, 0), (dh, 2 - dh), (0, 0))) for dh in range(3)],
        axis=0)                                     # [3Co, slab+2, W]
    o_ref[...] += jax.lax.dot_general(
        g2.reshape(3 * cout, rows * width),
        xcol.reshape(3 * cin, rows * width),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _wgrad_kernel_dwnp(x_ref, g_ref, o_ref, *, slab, width, cin, cout):
    """x_ref [1, Cin, slab+8, W] (NO W pad), g_ref [1, Co, slab, W],
    o_ref [9, Cin, Cout] accumulated over the sequential grid.

    The wgrad mirror of the dwnp forward: instead of contracting nine
    dw-shifted x slices against g, contract THREE lane-aligned dh slices
    against g and two masked lane-rolled copies of g —
    dW[dh,dw] = sum_n x[ci, n] g[co, n - dw + 1] (zero outside the row).
    Rolls are 32-bit only on Mosaic, so g is rolled as f32 and cast back
    (bf16->f32->bf16 is exact)."""
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[0]
    g = g_ref[0].reshape(cout, slab * width)
    gf = g.astype(jnp.float32)
    n = jax.lax.broadcasted_iota(jnp.int32, gf.shape, 1)
    # dw=0 tap: dW += sum_c x[c-1] g[c] = sum_n x[n] g[n+1]
    g0 = jnp.where(n % width == width - 1, 0.0,
                   pltpu.roll(gf, slab * width - 1, 1)).astype(g.dtype)
    # dw=2 tap: dW += sum_c x[c+1] g[c] = sum_n x[n] g[n-1]
    g2 = jnp.where(n % width == 0, 0.0,
                   pltpu.roll(gf, 1, 1)).astype(g.dtype)
    gs = (g0, g, g2)
    for dh in range(3):
        xs = x[:, _HOFF + dh:_HOFF + dh + slab, :].reshape(
            cin, slab * width)
        for dw in range(3):
            o_ref[dh * 3 + dw] += jax.lax.dot_general(
                xs, gs[dw], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _wgrad_kernel_dwnp1(x_ref, g_ref, o_ref, *, slab, width, cin, cout):
    """x_ref [1, Cin, slab+8, W] (NO W pad), g_ref [1, Co, slab, W],
    o_ref [3*Cin, 3*Cout] accumulated over the sequential grid.

    ALL NINE taps in ONE matmul: the r4 anatomy
    (scripts/tpu_wgrad_anatomy.py, docs/PERF.md "Round 4b/4c") showed
    the 256px wgrad is matmul-COUNT-bound (~0.054 ms per tiny-M/N
    [32,N]x[N,16] contraction, 9 of them = 0.43 of the 0.677 ms call).
    The dw operands (g and its two masked f32 lane-rolls) are already
    materialized in the dwnp wgrad, so packing them into matmul N (G3 =
    sublane concat -> [N, 3Co]) and the three dh slices into M (X3 ->
    [3Cin, N]) costs only two sublane concats and collapses 9 matmuls
    into one [3Cin,N]x[N,3Co]. Layout: out[dh*Cin+ci, dw*Cout+co] =
    dW[dh,dw,ci,co], unpacked by the caller (tiny [3C,3Co] f32)."""
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[0]
    g = g_ref[0].reshape(cout, slab * width)
    gf = g.astype(jnp.float32)
    n = jax.lax.broadcasted_iota(jnp.int32, gf.shape, 1)
    g0 = jnp.where(n % width == width - 1, 0.0,
                   pltpu.roll(gf, slab * width - 1, 1)).astype(g.dtype)
    g2 = jnp.where(n % width == 0, 0.0,
                   pltpu.roll(gf, 1, 1)).astype(g.dtype)
    g3 = jnp.concatenate([g0, g, g2], axis=0)
    x3 = jnp.concatenate(
        [x[:, _HOFF + dh:_HOFF + dh + slab, :].reshape(cin, slab * width)
         for dh in range(3)], axis=0)
    o_ref[...] += jax.lax.dot_general(
        x3, g3, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _wgrad_kernel_dwnp1f(x_ref, g_ref, o_ref, *, slab, width, cin, cout):
    """FLAT twin of _wgrad_kernel_dwnp1: x_ref [1, Cin, (slab+8)*W]
    (flat lane view), g_ref [1, Co, slab*W] (flat), o_ref [3C, 3Co].
    The dh slices and the g center block are aligned lane extractions —
    no sublane→lane relayouts anywhere in the kernel."""
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[0]
    g = g_ref[0]
    gf = g.astype(jnp.float32)
    n = jax.lax.broadcasted_iota(jnp.int32, gf.shape, 1)
    g0 = jnp.where(n % width == width - 1, 0.0,
                   pltpu.roll(gf, slab * width - 1, 1)).astype(g.dtype)
    g2 = jnp.where(n % width == 0, 0.0,
                   pltpu.roll(gf, 1, 1)).astype(g.dtype)
    g3 = jnp.concatenate([g0, g, g2], axis=0)
    x3 = jnp.concatenate(
        [x[:, (_HOFF + dh) * width:(_HOFF + dh) * width + slab * width]
         for dh in range(3)], axis=0)
    o_ref[...] += jax.lax.dot_general(
        x3, g3, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


_WGRAD_ONLY = frozenset({"dwnp1", "dwnp1f"})
# variants whose wgrad kernel reads an UNPADDED-W input (wpad=0); the
# custom-VJP residual pad adjustment (_vjp_bwd_nchw) must agree with
# conv3x3_nchw_wgrad's own wpad choice, so both read this one tuple.
_WGRAD_NOPAD = frozenset({"dwnp", "dwnp1", "dwnp1f", "dwm", "dwmf"})
# packed one-matmul wgrads: [3Co, .] sublane unpack needs Co % 8 == 0
_WGRAD_PACKED = frozenset({"dwnp1", "dwnp1f", "dwm", "dwmf"})


def conv3x3_nchw_wgrad(x: jax.Array, g: jax.Array,
                       interpret: bool = False,
                       variant: str = "im2col",
                       prepadded: bool = False,
                       hw=None) -> jax.Array:
    """x [B, Cin, H, W], g [B, Cout, H, W] -> dW [3, 3, Cin, Cout] f32.

    FLAT mode (r5): 3-D x [B, Cin, (H+8)*W] (prepadded flat lane view)
    + 3-D g [B, Cout, H*W] with hw=(H, W); variant must be the flat
    packed 'dwnp1f'. Avoids the 4-D<->flat boundary relayouts."""
    if variant not in VARIANTS and variant not in _WGRAD_ONLY:
        # dwnp1/dwnp1f are wgrad-only (no forward analog) — reachable
        # via UAPS_WGRAD_VARIANT, not UAPS_CONV_VARIANT
        raise ValueError(f"unknown conv variant {variant!r}; "
                         f"expected one of {sorted(VARIANTS)}")
    flat_io = x.ndim == 3
    if flat_io:
        assert hw is not None and prepadded and g.ndim == 3, (hw, g.shape)
        assert variant in ("dwnp1f", "dwmf"), variant
    if variant == "fullh":
        if prepadded:
            x = x[:, :, 4:-4, 1:-1]
        return conv3x3_nchw_wgrad_fullh(x, g, interpret)
    cout = g.shape[1]
    co_real = None
    if variant in _WGRAD_PACKED and cout % 8 != 0:
        # the packed kernels build [3Co, .] sublane concats at offsets
        # {0, Co, 2Co}; a non-8-multiple Co forces sublane relayouts
        # (latent Mosaic compile failure on-chip). r5: zero-pad g's
        # channel dim to the next 8-multiple — padded rows stay zero
        # through the masked rolls, so the extra dW columns are exact
        # zeros and are sliced off after the unpack. This keeps the
        # 9->1 matmul-count win for the Co=4 heads.
        # UAPS_HEAD_COPAD=0 restores the per-tap dwnp fallback.
        if os.environ.get("UAPS_HEAD_COPAD", "1") == "0":
            variant = "dwnp"
        else:
            co_real = cout
            g = jnp.pad(g, ((0, 0), (0, (-cout) % 8))
                        + ((0, 0),) * (g.ndim - 2))
            cout = g.shape[1]
    wpad = 0 if variant in _WGRAD_NOPAD else 1
    if flat_io:
        h, width = hw
        b, cin = x.shape[:2]
    else:
        b, cin, h, width = x.shape
        if prepadded:
            h, width = h - 8, width - 2 * wpad
    slab = _pick_slab(h)
    xp = x if prepadded else jnp.pad(
        x, ((0, 0), (0, 0), (4, 4), (wpad, wpad)))
    kernel = functools.partial(
        {"im2col": _wgrad_kernel_im2col,
         "dhdw": _wgrad_kernel_dhdw,
         "dwnp": _wgrad_kernel_dwnp,
         "dwm": _wgrad_kernel_dwnp1,   # dwm couples to the packed wgrad
         "dwmf": _wgrad_kernel_dwnp1f,
         "dwnp1f": _wgrad_kernel_dwnp1f,
         "dwnp1": _wgrad_kernel_dwnp1}.get(variant, _wgrad_kernel),
        slab=slab, width=width, cin=cin, cout=cout)
    packed = variant in ("dwnp1", "dwnp1f", "dwm", "dwmf")
    out_shape = {"im2col": (9 * cin, cout),
                 "dhdw": (3 * cout, 3 * cin)}.get(
        variant, (3 * cin, 3 * cout) if packed else (9, cin, cout))
    if variant in ("dwnp1f", "dwmf"):
        # flat lane views: every in-kernel slice is an aligned lane
        # extraction (flat_io callers pass them pre-flattened)
        xin = xp if flat_io else xp.reshape(b, cin, (h + 8) * width)
        gin = g if flat_io else g.reshape(b, cout, h * width)
        in_specs = [
            pl.BlockSpec((pl.Element(1), pl.Element(cin),
                          pl.Element((slab + 8) * width)),
                         lambda bi, si: (bi, 0, si * slab * width),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, slab * width),
                         lambda bi, si: (bi, 0, si),
                         memory_space=pltpu.VMEM),
        ]
    else:
        xin, gin = xp, g
        in_specs = [
            pl.BlockSpec((pl.Element(1), pl.Element(cin),
                          pl.Element(slab + 8),
                          pl.Element(width + 2 * wpad)),
                         lambda bi, si: (bi, 0, si * slab, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, slab, width),
                         lambda bi, si: (bi, 0, si, 0),
                         memory_space=pltpu.VMEM),
        ]
    flat = pl.pallas_call(
        kernel,
        grid=(b, h // slab),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(out_shape,
                               (lambda bi, si: (0,) * len(out_shape)),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        interpret=interpret,
        compiler_params=_wgrad_compiler_params(),
    )(xin, gin)
    if variant == "dhdw":
        # [3Co, 3C] rows dh*Co+co, cols dw*C+c -> [3, 3, Cin, Cout]
        return flat.reshape(3, cout, 3, cin).transpose(0, 2, 3, 1)
    if packed:
        # [3C, 3Co] rows dh*C+c, cols dw*Co+co -> [3, 3, Cin, Cout]
        dw_full = flat.reshape(3, cin, 3, cout).transpose(0, 2, 1, 3)
        return dw_full if co_real is None else dw_full[..., :co_real]
    return flat.reshape(3, 3, cin, cout)


def _shift_f32(p, dw):
    """Zero-padded column shift on a 32-bit tensor:
    result[..., j] = p[..., j + dw - 1] == 0-padded roll by (1 - dw).
    Mosaic lane rotates only support 32-bit data, so the conv's column
    halo is applied to the f32 partial/accumulator, never to bf16 inputs."""
    if dw == 1:
        return p
    width = p.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, p.shape, len(p.shape) - 1)
    rolled = pltpu.roll(p, (1 - dw) % width, len(p.shape) - 1)
    edge = (lane == 0) if dw == 0 else (lane == width - 1)
    return jnp.where(edge, jnp.zeros_like(p), rolled)


def _fwd_kernel_fullh(x_ref, w_ref, o_ref, *, slab, width, cin, cout):
    """Full-image block conv: x_ref [1, C, H+8, W] (H-padded ONLY — rows
    stay lane-aligned and the whole per-image channel plane is one
    contiguous DMA, which probes showed is where the halo-block kernels
    lose 5x to the bandwidth bound), w_ref [9, Cin, Cout],
    o_ref [1, Co, H, W]. Column halos are applied as f32 lane rolls of
    the per-dw partial sums; rows iterate in static slabs."""
    x = x_ref[0]
    nslab = o_ref.shape[2] // slab
    for si in range(nslab):
        r0 = 3 + si * slab                 # padded row of true row si*slab-1
        xwin = x[:, r0:r0 + slab + 2, :]   # [C, slab+2, W]
        acc = jnp.zeros((cout, slab, width), jnp.float32)
        for dw in range(3):
            p = jnp.zeros((cout, slab * width), jnp.float32)
            for dh in range(3):
                xs = xwin[:, dh:dh + slab, :].reshape(cin, slab * width)
                p = p + jax.lax.dot_general(
                    w_ref[dh * 3 + dw], xs, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            # y[co, i, j] += p_dw[co, i, j + dw - 1]
            acc = acc + _shift_f32(p.reshape(cout, slab, width), dw)
        o_ref[0, :, si * slab:(si + 1) * slab, :] = acc.astype(o_ref.dtype)


def conv3x3_nchw_fullh(x: jax.Array, w: jax.Array,
                       interpret: bool = False) -> jax.Array:
    """x [B, Cin, H, W], w [3, 3, Cin, Cout] -> [B, Cout, H, W]
    (SAME, stride 1). H-padded contiguous-DMA variant."""
    b, cin, h, width = x.shape
    cout = w.shape[-1]
    slab = _pick_slab(h)
    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (0, 0)))
    wp = w.reshape(9, cin, cout).astype(x.dtype)
    kernel = functools.partial(_fwd_kernel_fullh, slab=slab, width=width,
                               cin=cin, cout=cout)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, cin, h + 8, width), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, h, width),
                               lambda bi: (bi, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, h, width), x.dtype),
        interpret=interpret,
    )(xp, wp)


def _wgrad_kernel_fullh(x_ref, g_ref, o_ref, *, slab, width, cin, cout):
    """x_ref [1, Cin, H+8, W], g_ref [1, Co, H, W], o_ref [9, Cin, Cout]."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[0]
    g = g_ref[0]
    nslab = g_ref.shape[2] // slab
    for si in range(nslab):
        r0 = 3 + si * slab
        xwin = x[:, r0:r0 + slab + 2, :]
        gblk = g[:, si * slab:(si + 1) * slab, :].astype(jnp.float32)
        for dw in range(3):
            # dW[dh,dw] = sum_j' x[:, :, j'] * g[:, :, j' + 1 - dw]
            gs = _shift_f32(gblk, 2 - dw).astype(g.dtype).reshape(
                cout, slab * width)
            for dh in range(3):
                xs = xwin[:, dh:dh + slab, :].reshape(cin, slab * width)
                o_ref[dh * 3 + dw] += jax.lax.dot_general(
                    xs, gs, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(o_ref.dtype)


def conv3x3_nchw_wgrad_fullh(x: jax.Array, g: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """x [B, Cin, H, W], g [B, Cout, H, W] -> dW [3, 3, Cin, Cout] f32."""
    b, cin, h, width = x.shape
    cout = g.shape[1]
    slab = _pick_slab(h)
    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (0, 0)))
    kernel = functools.partial(_wgrad_kernel_fullh, slab=slab, width=width,
                               cin=cin, cout=cout)
    flat = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, cin, h + 8, width), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout, h, width), lambda bi: (bi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((9, cin, cout), lambda bi: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, cin, cout), jnp.float32),
        interpret=interpret,
    )(xp, g)
    return flat.reshape(3, 3, cin, cout)


def _xla_conv_nhwc(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_fast(x: jax.Array, w: jax.Array,
                 interpret: bool = False,
                 variant: str = "taps") -> jax.Array:
    """NHWC-facing differentiable conv using the NCHW kernel."""
    xc = jnp.transpose(x, (0, 3, 1, 2))
    out = conv3x3_nchw(xc, w, interpret, variant)
    return jnp.transpose(out, (0, 2, 3, 1))


def _vjp_fwd(x, w, interpret, variant):
    return conv3x3_fast(x, w, interpret, variant), (x, w)


def _wgrad_variant(fwd_variant: str) -> str:
    """The wgrad kernel variant defaults by forward variant, overridable
    per-process via UAPS_WGRAD_VARIANT for step-level A/Bs (VERDICT r2
    #4; scripts/tpu_session_r3b.sh). Since r4: dwnp/dwm forwards couple
    to the PACKED one-matmul wgrad 'dwnp1' — the r4 anatomy showed the
    wgrad is matmul-count-bound and the full-step A/B measured
    **85.6 -> 78.8 ms/step** (scripts/tpu_session_r4e.sh)."""
    import os
    env = os.environ.get("UAPS_WGRAD_VARIANT", "")
    if env:
        return env
    if fwd_variant == "dwmf":
        return "dwnp1f"
    return "dwnp1" if fwd_variant in ("dwnp", "dwm") else fwd_variant


def _vjp_bwd(interpret, variant, res, g):
    """Backward with an optional shape gate. Isolated conv-pair chains
    suggested routing the cin>32 backward to XLA, but the chains were a
    dispatch-overhead artifact: in the REAL train step all-pallas bwd
    measures 123.7 ms vs 127.8 ms gated (same process, v5e bf16 bs16), so
    the default keeps pallas everywhere. UAPS_CONV_BWD_PALLAS_MAX_CIN
    remains as the ablation knob (e.g. =32 restores the gate)."""
    import os
    x, w = res
    cin = w.shape[2]
    g = g.astype(x.dtype)
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    max_cin = int(os.environ.get("UAPS_CONV_BWD_PALLAS_MAX_CIN", "9999"))
    if cin <= max_cin or interpret:
        dx = conv3x3_fast(g, w_rot, interpret, variant)
        xc = jnp.transpose(x, (0, 3, 1, 2))
        gc = jnp.transpose(g, (0, 3, 1, 2))
        dw = conv3x3_nchw_wgrad(xc, gc, interpret,
                                _wgrad_variant(variant)).astype(w.dtype)
    else:
        dx = _xla_conv_nhwc(g, w_rot.astype(g.dtype))
        _, wvjp = jax.vjp(lambda ww: _xla_conv_nhwc(x, ww), w)
        dw = wvjp(g.astype(x.dtype))[0]
    return dx, dw


conv3x3_fast.defvjp(_vjp_fwd, _vjp_bwd)


def _xla_conv_nchw(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW"))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3x3_fast_nchw(x: jax.Array, w: jax.Array,
                      interpret: bool = False,
                      variant: str = "taps",
                      out_dtype=None) -> jax.Array:
    """NCHW-native differentiable conv — NO boundary transposes.

    Profiling the full UAPS step showed the NHWC wrapper's layout
    transposes are NOT elided in context (XLA materializes ~460us 64MB
    'data formatting' copies around every pallas custom call, ~21 ms per
    step total); model stages that keep activations NCHW call this
    directly."""
    return conv3x3_nchw(x, w, interpret, variant, out_dtype)


def _vjp_fwd_nchw(x, w, interpret, variant, out_dtype):
    # Pad once and keep the PADDED tensor as the residual: the wgrad
    # would otherwise re-pad x in the backward (profiled ~2.3 ms/step of
    # duplicate pad copies). XLA CSEs the forward's pad with this one.
    # (dwnp carries no W padding — see _fwd_kernel_dwout wpad=0.)
    wp = 0 if variant in ("dwnp", "dwm", "dwmf") else 1
    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (wp, wp)))
    y = conv3x3_nchw(xp, w, interpret, variant, out_dtype, prepadded=True)
    return y, (xp, w)


def _vjp_bwd_nchw(interpret, variant, out_dtype, res, g):
    import os
    xp, w = res
    cin = w.shape[2]
    g = g.astype(xp.dtype)
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    max_cin = int(os.environ.get("UAPS_CONV_BWD_PALLAS_MAX_CIN", "9999"))
    if cin <= max_cin or interpret:
        dx = conv3x3_fast_nchw(g, w_rot, interpret, variant)
        wgv = _wgrad_variant(variant)
        xw = xp
        if wgv != variant:
            # the residual was padded for the FORWARD variant's wpad;
            # adjust the W pad to what the override's kernel expects
            fw = 0 if variant in ("dwnp", "dwm", "dwmf") else 1
            ww = 0 if wgv in _WGRAD_NOPAD else 1
            if ww > fw:
                xw = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (1, 1)))
            elif ww < fw:
                xw = xp[:, :, :, 1:-1]
        dw = conv3x3_nchw_wgrad(xw, g, interpret, wgv,
                                prepadded=True).astype(w.dtype)
    else:
        x = (xp[:, :, 4:-4] if variant in ("dwnp", "dwm", "dwmf")
             else xp[:, :, 4:-4, 1:-1])
        dx = _xla_conv_nchw(g, w_rot.astype(g.dtype))
        _, wvjp = jax.vjp(lambda ww: _xla_conv_nchw(x, ww), w)
        dw = wvjp(g.astype(x.dtype))[0]
    return dx, dw


conv3x3_fast_nchw.defvjp(_vjp_fwd_nchw, _vjp_bwd_nchw)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def conv3x3_fast_flat(x: jax.Array, w: jax.Array, hw,
                      interpret: bool = False,
                      out_dtype=None) -> jax.Array:
    """FLAT differentiable conv: x [B, Cin, H*W] (the kernels' native
    C-in-sublanes lane view), w [3, 3, Cin, Cout], static hw=(H, W) ->
    [B, Cout, H*W]. The ConvBlock flat island chains these without
    leaving the flat layout: the 4-D<->flat boundary reshapes are
    genuine relayouts (r5a profile: 7.17 ms/step of them), and the
    dwmf/dwnp1f kernels already consume and produce exactly these flat
    buffers. The H halo is a contiguous 4W-zero lane pad."""
    xp = jnp.pad(x, ((0, 0), (0, 0), (4 * hw[1], 4 * hw[1])))
    return conv3x3_nchw(xp, w, interpret, "dwmf", out_dtype,
                        prepadded=True, hw=hw)


def _vjp_fwd_flat(x, w, hw, interpret, out_dtype):
    # keep the PADDED flat tensor as the residual (the wgrad wants it;
    # XLA CSEs with the forward's pad)
    xp = jnp.pad(x, ((0, 0), (0, 0), (4 * hw[1], 4 * hw[1])))
    y = conv3x3_nchw(xp, w, interpret, "dwmf", out_dtype,
                     prepadded=True, hw=hw)
    return y, (xp, w)


def _vjp_bwd_flat(hw, interpret, out_dtype, res, g):
    xp, w = res
    g = g.astype(xp.dtype)
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv3x3_fast_flat(g, w_rot, hw, interpret)
    dw = conv3x3_nchw_wgrad(xp, g, interpret, "dwnp1f",
                            prepadded=True, hw=hw).astype(w.dtype)
    return dx, dw


conv3x3_fast_flat.defvjp(_vjp_fwd_flat, _vjp_bwd_flat)


def _fwd_kernel_stats(x_ref, w_ref, o_ref, s1_ref, s2_ref, *,
                      slab, width, cin, cout):
    """taps kernel + per-channel moment outputs: the f32 accumulator is
    already in VMEM, so emitting sum and sum-of-squares per channel makes
    the following BatchNorm's statistics pass FREE (profiled at ~10 ms
    per step of bf16->f32 convert_reduce fusions otherwise)."""
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        s1_ref[...] = jnp.zeros_like(s1_ref)
        s2_ref[...] = jnp.zeros_like(s2_ref)

    x = x_ref[0]
    acc = jnp.zeros((cout, slab * width), jnp.float32)
    for dh in range(3):
        for dw in range(3):
            xs = x[:, _HOFF + dh:_HOFF + dh + slab, dw:dw + width]
            xr = xs.reshape(cin, slab * width)
            k = w_ref[dh * 3 + dw]
            acc = acc + jax.lax.dot_general(
                k, xr, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(cout, slab, width).astype(o_ref.dtype)
    s1_ref[...] += acc.sum(axis=1)[None]
    s2_ref[...] += (acc * acc).sum(axis=1)[None]


def conv3x3_nchw_stats(x: jax.Array, w: jax.Array,
                       interpret: bool = False):
    """x [B, Cin, H, W], w [3,3,Cin,Cout] ->
    (y [B,Cout,H,W], s1 [Cout] f32, s2 [Cout] f32) where s1/s2 are the
    per-channel sum / sum-of-squares of y over (B, H, W)."""
    b, cin, h, width = x.shape
    cout = w.shape[-1]
    slab = _pick_slab(h)
    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (1, 1)))
    wp = w.reshape(9, cin, cout).astype(x.dtype)
    kernel = functools.partial(_fwd_kernel_stats, slab=slab, width=width,
                               cin=cin, cout=cout)
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(b, h // slab),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(cin),
                          pl.Element(slab + 8), pl.Element(width + 2)),
                         lambda bi, si: (bi, 0, si * slab, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, cout, slab, width),
                         lambda bi, si: (bi, 0, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, si: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cout), lambda bi, si: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cout, h, width), x.dtype),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
            jax.ShapeDtypeStruct((1, cout), jnp.float32),
        ],
        interpret=interpret,
    )(xp, wp)
    return y, s1[0], s2[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_fast_nchw_stats(x: jax.Array, w: jax.Array,
                            interpret: bool = False):
    """Differentiable (y, s1, s2) conv. The moment outputs are linear /
    quadratic in y, so their cotangents fold into dy analytically:
    dy_eff = dy + ds1[c] + 2 y ds2[c]."""
    return conv3x3_nchw_stats(x, w, interpret)


def _vjp_fwd_stats(x, w, interpret):
    y, s1, s2 = conv3x3_fast_nchw_stats(x, w, interpret)
    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (1, 1)))
    return (y, s1, s2), (xp, w, y)


def _vjp_bwd_stats(interpret, res, cts):
    xp, w, y = res
    dy, ds1, ds2 = cts
    dy_eff = (dy.astype(jnp.float32)
              + ds1.astype(jnp.float32)[None, :, None, None]
              + 2.0 * y.astype(jnp.float32)
              * ds2.astype(jnp.float32)[None, :, None, None]
              ).astype(xp.dtype)
    w_rot = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
    dx = conv3x3_fast_nchw(dy_eff, w_rot, interpret)
    dw = conv3x3_nchw_wgrad(xp, dy_eff, interpret,
                            prepadded=True).astype(w.dtype)
    return dx, dw


conv3x3_fast_nchw_stats.defvjp(_vjp_fwd_stats, _vjp_bwd_stats)
