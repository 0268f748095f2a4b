"""2x2 max-pool (stride 2) NCHW Pallas kernel, forward + backward.

Reference semantics: nn.MaxPool2d(2) (utilities/UAPS_unet.py:53) — the
backward routes each window's cotangent to the FIRST maximum in
row-major window order (torch / XLA select-and-scatter GE tie rule).

Why a kernel: the r2c op-level profile showed XLA picks layout
{1,0,3,2} for the 256px select-and-scatter, paying 2x ~0.43 ms
transposes in AND out around the 1.09+0.94 ms pool ops (~3.8 ms/step
total); the earlier elementwise mask backward (pallas/maxpool.py) was
neutral because its 5 shifted mask tensors round-trip HBM. Here the
shifts/masks live in VMEM: the backward reads x and g once and writes
dx once.

Layout tricks (Mosaic rejects stride-2 lane reshapes like
[C,2s,2w]->[C,s,2,w,2]):
  * row pairing:   [C, 2r, W] -> [C, r, 2W] (row-major pair merge) puts
    each window's two rows side by side in lanes; the row max is then a
    max of two ALIGNED half-row slices (W is a lane-tile multiple).
  * column pairing: one masked f32 lane roll (32-bit only on Mosaic).
  * stride-2 lane compaction/expansion: tiny constant 0/1 selection
    matmuls built from 2-D iotas ([W, W/2] picks even lanes; [W/2, W]
    broadcasts each pooled lane to its pair) — MXU, exact in f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(h: int) -> int:
    for r in (32, 16):
        if h % r == 0:
            return r
    return h


def _sel_even(width: int) -> jax.Array:
    """[W, W/2] f32: S[2j, j] = 1 (picks even lanes under right-matmul)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (width, width // 2), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (width, width // 2), 1)
    return (r == 2 * c).astype(jnp.float32)


def _expand_pairs(width: int) -> jax.Array:
    """[W/2, W] f32: E[j, 2j] = E[j, 2j+1] = 1 (each pooled lane to its
    window pair under right-matmul)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (width // 2, width), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (width // 2, width), 1)
    return (c // 2 == r).astype(jnp.float32)


def _roll_m1(x: jax.Array) -> jax.Array:
    """Lane roll by -1: out[..., j] = x[..., j+1 (mod W)]."""
    return pltpu.roll(x, x.shape[-1] - 1, x.ndim - 1)


def _roll_p1(x: jax.Array) -> jax.Array:
    """Lane roll by +1: out[..., j] = x[..., j-1 (mod W)]."""
    return pltpu.roll(x, 1, x.ndim - 1)


def _fwd_kernel(x_ref, o_ref, *, c, rows, width):
    """x_ref [1, C, rows, W] -> o_ref [1, C, rows/2, W/2]."""
    r2 = rows // 2
    x = x_ref[0].astype(jnp.float32)
    z = x.reshape(c, r2, 2 * width)            # window rows side by side
    rm = jnp.maximum(z[:, :, :width], z[:, :, width:])
    # window max lands on EVEN lanes; the odd-lane wrap value is unused
    cm = jnp.maximum(rm, _roll_m1(rm))
    y = jax.lax.dot_general(
        cm.reshape(c * r2, width), _sel_even(width),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    o_ref[0] = y.reshape(c, r2, width // 2).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, o_ref, *, c, rows, width):
    """x_ref [1, C, rows, W], g_ref [1, C, rows/2, W/2] ->
    o_ref [1, C, rows, W] routing g to the first row-major window max."""
    r2 = rows // 2
    x = x_ref[0].astype(jnp.float32)
    z = x.reshape(c, r2, 2 * width)
    zl, zr = z[:, :, :width], z[:, :, width:]
    rm = jnp.maximum(zl, zr)
    cm = jnp.maximum(rm, _roll_m1(rm))          # window max at even lanes
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, r2, width), 2)
    evenf = jnp.where(lane % 2 == 0, 1.0, 0.0)  # f32 0/1 parity mask
    pm = evenf * cm + (1.0 - evenf) * _roll_p1(cm)  # window max everywhere
    # cotangent at every lane of its window
    g = g_ref[0].astype(jnp.float32)
    ge = jax.lax.dot_general(
        g.reshape(c * r2, width // 2), _expand_pairs(width),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).reshape(c, r2, width)
    # first-in-row-major-order tie routing. Window order:
    #   (2i,2j)=zl@even, (2i,2j+1)=zl@odd, (2i+1,2j)=zr@even,
    #   (2i+1,2j+1)=zr@odd
    # All mask algebra stays in f32 0/1 arithmetic (AND=a*b,
    # OR=max(a,b), NOT=1-a): Mosaic on this toolchain rejects the i1
    # vector network ("Unsupported target bitwidth for truncation",
    # r4 probe) but compare->where->f32 is the conv kernels' proven
    # pattern.
    eql = jnp.where(zl == pm, 1.0, 0.0)
    eqr = jnp.where(zr == pm, 1.0, 0.0)
    prevl = _roll_p1(eql)                       # eql at lane j-1
    prevr = _roll_p1(eqr)
    nextl = _roll_m1(eql)                       # eql at lane j+1
    # any zl position of THIS window equal to the max (per lane parity)
    anyl = jnp.minimum(
        evenf * (eql + nextl) + (1.0 - evenf) * (prevl + eql), 1.0)
    sell = eql * jnp.maximum(evenf, 1.0 - prevl)
    selr = eqr * (1.0 - anyl) * jnp.maximum(evenf, 1.0 - prevr)
    dxl = ge * sell
    dxr = ge * selr
    dx = jnp.concatenate([dxl, dxr], axis=2).reshape(c, rows, width)
    o_ref[0] = dx.astype(o_ref.dtype)


def pool_pallas_ok(x: jax.Array) -> bool:
    """Shape gate: NCHW 4-D, lane-tile-aligned W, even tiled H, and the
    per-block VMEM footprint bounded — the backward kernel keeps the x/g/dx
    blocks plus ~6 f32 intermediates (z, rm, cm, pm, ge, masks) resident,
    so the [c, rows, w] block itself must stay small (2 MB block ≈ <16 MB
    scoped VMEM worst case) or oversized shapes would fail at compile/run
    time instead of falling back to reduce_window (ADVICE r2)."""
    if x.ndim != 4:
        return False
    _, c, h, w = x.shape
    return (h >= 16 and h % 16 == 0 and w >= 128 and w % 128 == 0
            and c <= 64 and c * _pick_rows(h) * w * 4 <= (2 << 20))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_2x2_nchw(x: jax.Array, interpret: bool = False) -> jax.Array:
    """x [B, C, H, W] -> [B, C, H/2, W/2], 2x2 window, stride 2."""
    b, c, h, w = x.shape
    rows = _pick_rows(h)
    kernel = functools.partial(_fwd_kernel, c=c, rows=rows, width=w)
    return pl.pallas_call(
        kernel,
        grid=(b, h // rows),
        in_specs=[pl.BlockSpec((1, c, rows, w),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, rows // 2, w // 2),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h // 2, w // 2), x.dtype),
        interpret=interpret,
    )(x)


def _pool_fwd(x, interpret):
    return max_pool_2x2_nchw(x, interpret), x


def _pool_bwd(interpret, x, g):
    b, c, h, w = x.shape
    rows = _pick_rows(h)
    kernel = functools.partial(_bwd_kernel, c=c, rows=rows, width=w)
    dx = pl.pallas_call(
        kernel,
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec((1, c, rows, w), lambda bi, si: (bi, 0, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, rows // 2, w // 2),
                         lambda bi, si: (bi, 0, si, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, rows, w),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), x.dtype),
        interpret=interpret,
    )(x, g.astype(x.dtype))
    return (dx,)


max_pool_2x2_nchw.defvjp(_pool_fwd, _pool_bwd)
