"""Fused CE + Dice loss kernel (channels-in-sublanes, analytic VJP).

Every method computes 0.5(CE + Dice) pairs on [B, H, W, C] logits with
C = num_classes (4 for NEU). In XLA each pass over those tensors pays the
C->128 lane-padding tax (see PERF.md); this kernel computes BOTH losses'
sufficient statistics in one pass over a [C, slab, W] layout:

  forward:  nll_sum = sum -log softmax(logits)[label]
            per class c: I_c = sum p_c y_c, P_c = sum p_c, Y_c = sum y_c
  combine (in-graph, tiny): CE = nll_sum / N
            Dice = 1 - mean_c 2 I_c / (P_c + Y_c + eps)    (reference
            pytorch_losses.py:54-89 semantics: eps in denominator only)

  backward (one kernel): recompute p per tile and emit
    dlogits = g_ce/N (p - y)
            + p * (q - sum_c q_c p_c), q_c(x) = g_dice*(-(a_c y_c(x)+b_c))
    with a_c = (2/C)/S_c, b_c = -(2/C) I_c / S_c^2, S_c = P_c + Y_c + eps
    (the softmax chain rule applied to the per-class dice partials).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_slab(h: int) -> int:
    for s in (32, 16, 8):
        if h % s == 0:
            return s
    return h


def _fwd_kernel(x_ref, y_ref, stats_ref, *, slab, width, c):
    """x_ref [1, C, slab, W] logits (f32), y_ref [1, slab, W] int32,
    stats_ref [4, C] f32 accumulated across the sequential grid
    (rows: I, P, Y; row 3 col 0 holds the nll sum). Whole-array
    accumulation — Mosaic cannot store scalars to VMEM."""
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    x = x_ref[0].astype(jnp.float32)               # [C, slab, W]
    y = y_ref[0]                                   # [slab, W]
    m = x[0]
    for k in range(1, c):
        m = jnp.maximum(m, x[k])
    s = jnp.zeros((slab, width), jnp.float32)
    for k in range(c):
        s = s + jnp.exp(x[k] - m)
    logz = jnp.log(s) + m
    logit_y = jnp.zeros((slab, width), jnp.float32)
    i_v, p_v, y_v = [], [], []
    for k in range(c):
        yk = (y == k).astype(jnp.float32)
        pk = jnp.exp(x[k] - m) / s
        logit_y = logit_y + yk * x[k]
        i_v.append(jnp.sum(pk * yk))
        p_v.append(jnp.sum(pk))
        y_v.append(jnp.sum(yk))
    nll = jnp.sum(logz - logit_y)
    nll_row = [nll] + [jnp.float32(0.0)] * (c - 1)
    update = jnp.stack([jnp.stack(i_v), jnp.stack(p_v), jnp.stack(y_v),
                        jnp.stack(nll_row)])
    stats_ref[...] += update


def _bwd_kernel(x_ref, y_ref, q_ref, gce_ref, o_ref, *, slab, width, c):
    """dlogits for one tile: q_ref [1, C] per-class dice grads wrt p_c
    (already scaled by upstream g_dice), gce_ref [1, 1] = g_ce / N."""
    x = x_ref[0].astype(jnp.float32)
    y = y_ref[0]
    m = x[0]
    for k in range(1, c):
        m = jnp.maximum(m, x[k])
    s = jnp.zeros((slab, width), jnp.float32)
    for k in range(c):
        s = s + jnp.exp(x[k] - m)
    gce = gce_ref[0]
    # qdot(x) = sum_c q_c(x) p_c(x); q_c(x) = qa_c * y_c(x) + qb_c
    # packed in q_ref rows: q_ref[0] = qa, q_ref[1] = qb
    qdot = jnp.zeros((slab, width), jnp.float32)
    ps = []
    qs = []
    for k in range(c):
        pk = jnp.exp(x[k] - m) / s
        yk = (y == k).astype(jnp.float32)
        qk = q_ref[k] * yk + q_ref[c + k]
        qdot = qdot + qk * pk
        ps.append(pk)
        qs.append((qk, yk))
    for k in range(c):
        qk, yk = qs[k]
        o_ref[0, k] = (gce * (ps[k] - yk)
                       + ps[k] * (qk - qdot)).astype(o_ref.dtype)


def _run_fwd(x_nchw, y, slab):
    b, c, h, w = x_nchw.shape
    kernel = functools.partial(_fwd_kernel, slab=slab, width=w, c=c)
    stats = pl.pallas_call(
        kernel,
        grid=(b, h // slab),
        in_specs=[
            pl.BlockSpec((1, c, slab, w), lambda bi, si: (bi, 0, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, slab, w), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, c), lambda bi, si: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, c), jnp.float32),
        interpret=_interp(),
    )(x_nchw, y)
    return stats[3, 0], stats[:3]


def _interp():
    return jax.devices()[0].platform != "tpu"


EPS = 1e-7


@jax.custom_vjp
def fused_ce_dice(logits: jax.Array, labels: jax.Array):
    """logits [B, H, W, C] (any float), labels [B, H, W] int ->
    (ce, dice_loss) scalars, reference semantics."""
    ce, dice, _ = _fwd_impl(logits, labels)
    return ce, dice


def _fwd_impl(logits, labels):
    b, h, w, c = logits.shape
    slab = _pick_slab(h)
    x = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)
    y = labels.astype(jnp.int32)
    nll_sum, stats = _run_fwd(x, y, slab)
    n = b * h * w
    ce = nll_sum / n
    i_c, p_c, y_c = stats[0], stats[1], stats[2]
    s_c = p_c + y_c + EPS
    dice = 1.0 - jnp.mean(2.0 * i_c / s_c)
    return ce, dice, stats


def _vjp_fwd(logits, labels):
    ce, dice, stats = _fwd_impl(logits, labels)
    return (ce, dice), (logits, labels, stats)


def _vjp_bwd(res, g):
    g_ce, g_dice = g
    logits, labels, stats = res
    b, h, w, c = logits.shape
    slab = _pick_slab(h)
    n = b * h * w
    i_c, p_c, y_c = stats[0], stats[1], stats[2]
    s_c = p_c + y_c + EPS
    # d(dice_loss)/dI_c and the per-pixel affine form q_c = qa_c y_c + qb_c
    # dice_loss = 1 - (2/C) sum_c I_c / S_c; dS_c/dp_c(x) = 1
    # d/dp_c(x) = -(2/C) [y_c(x) S_c - I_c] / S_c^2
    qa = g_dice * (-(2.0 / c) / s_c)
    qb = g_dice * ((2.0 / c) * i_c / (s_c * s_c))
    q = jnp.concatenate([qa, qb]).astype(jnp.float32)    # [2C]: qa then qb
    gce = jnp.reshape(g_ce / n, (1,)).astype(jnp.float32)

    x = jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32)
    y = labels.astype(jnp.int32)
    kernel = functools.partial(_bwd_kernel, slab=slab, width=w, c=c)
    dx = pl.pallas_call(
        kernel,
        grid=(b, h // slab),
        in_specs=[
            pl.BlockSpec((1, c, slab, w), lambda bi, si: (bi, 0, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, slab, w), lambda bi, si: (bi, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, c, slab, w),
                               lambda bi, si: (bi, 0, si, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, w), jnp.float32),
        interpret=_interp(),
    )(x, y, q, gce)
    dlogits = jnp.transpose(dx, (0, 2, 3, 1)).astype(logits.dtype)
    return dlogits, None


fused_ce_dice.defvjp(_vjp_fwd, _vjp_bwd)
