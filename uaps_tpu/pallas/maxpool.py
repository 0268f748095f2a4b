"""2x2 max-pool (NCHW) with a select-and-scatter-free custom VJP.

XLA lowers the pool backward as `select-and-scatter`, profiled at ~1 ms
per [16,16,256,256] call (~2.5 ms/step total) — ~20x its DMA floor. The
forward keeps the native `reduce_window` (already fast), but the custom
backward recomputes the window argmax with elementwise ops only — an
equality mask against the 2x-upsampled max plus parity-gated neighbor
checks — which XLA fuses into a couple of VPU passes. The cotangent is
routed to the FIRST maximum in row-major window order, matching XLA's
select-and-scatter (GE comparator) and torch MaxPool2d semantics, so
tie-handling matches the reference (`utilities/UAPS_unet.py:53`,
nn.MaxPool2d(2)).

A first attempt as a Pallas kernel hit Mosaic's lane-layout wall: the
stride-2 window views need `[C, 2s, 2w] -> [C, s, 2, w, 2]` reshapes,
which this toolchain's infer-vector-layout rejects ("unsupported shape
cast") — stride-2 lane access has no cheap vector layout. XLA's logical
reshapes + fused elementwise achieve the same without a custom kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _reduce_window_max(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else x.dtype
        .type(jnp.iinfo(x.dtype).min),
        jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")


def _up2(m: jax.Array) -> jax.Array:
    """[B, C, h, w] -> [B, C, 2h, 2w] nearest (broadcast, no gather)."""
    b, c, h, w = m.shape
    m = jnp.broadcast_to(m[:, :, :, None, :, None], (b, c, h, 2, w, 2))
    return m.reshape(b, c, 2 * h, 2 * w)


def _shift(x: jax.Array, dh: int, dw: int) -> jax.Array:
    """Zero-padded shift: out[i, j] = x[i + dh, j + dw]."""
    b, c, h, w = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (1, 1)))
    return jax.lax.dynamic_slice(x, (0, 0, 1 + dh, 1 + dw), (b, c, h, w))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool_2x2_fast(x: jax.Array, interpret: bool = False) -> jax.Array:
    """x [B, C, H, W] -> [B, C, H/2, W/2] (2x2, stride 2).

    `interpret` is accepted for API parity with the pallas ops; the
    implementation is pure XLA so it is ignored."""
    return _reduce_window_max(x)


def _mp_fwd(x, interpret):
    return max_pool_2x2_fast(x, interpret), x


def _mp_bwd(interpret, x, g):
    b, c, h, w = x.shape
    m_up = _up2(_reduce_window_max(x))
    eq = x == m_up
    # First row-major window max: position (r%2, c%2) takes the gradient
    # only if no earlier in-window position also attains the max.
    # Earlier sets: (0,0) none; (0,1) L; (1,0) U, UR; (1,1) UL, U, L.
    eq_l = _shift(eq, 0, -1)
    eq_u = _shift(eq, -1, 0)
    eq_ur = _shift(eq, -1, 1)
    eq_ul = _shift(eq, -1, -1)
    rp = (jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0) % 2 == 1)
    cp = (jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) % 2 == 1)
    prior = ((cp & eq_l)
             | (rp & ~cp & (eq_u | eq_ur))
             | (rp & cp & (eq_ul | eq_u | eq_l)))
    dx = jnp.where(eq & ~prior, _up2(g), jnp.zeros((), g.dtype))
    return (dx,)


max_pool_2x2_fast.defvjp(_mp_fwd, _mp_bwd)
