"""Fused multi-decoder uncertainty kernel: per-decoder softmax, mean
prediction, per-decoder KL uncertainty maps, and the Dirichlet-mixed
argmax pseudo-label — ONE VMEM pass over the stacked decoder logits.

Replaces the UAPS unlabeled-side pipeline (/root/reference/
UAPS_train.py:223-255):
    softs_d  = softmax(logits_d)                       (:223)
    preds    = mean_d softs_d
    var_d    = sum_c preds_c (log preds_c - log softs_{d,c})   (:226-239)
    pseudo   = argmax_c sum_d w_d stopgrad(softs_{d,c})        (:251-255)
XLA evaluates these as elementwise passes over [B,H,W,C] tensors whose
C=4 class axis is padded to 128 VMEM lanes — a 32x layout tax per pass
(the same tax the pseudo-label kernel removed in round 1, PERF.md). The
fused kernel runs channels-first [D, C, H, W] so the tiled dims are the
well-shaped spatial dims, computes everything from one residency of the
logits, and regenerates softmaxes in the analytic backward instead of
storing them.

Backward math (gradients flow through BOTH the direct log-softmax term
and the shared mean `preds`, matching ops.losses.kl_divergence_map which
never detaches preds): with s_d = softmax(x_d), p = mean_d s_d,
upstream g_d for var_d, G = sum_e g_e,
    q_c  = G (1 + log p_c) - sum_e g_e log s_{e,c}
    dx_{d,c} = g_d (s_{d,c} - p_c) + (1/D) s_{d,c} (q_c - <s_d, q>)
The pseudo-label output is integer argmax — stop-gradient by
construction.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TINY = 1e-30  # log clamp; xlogy(0,0)=0 convention preserved (p=0 -> p*log=0)


def _reference_impl(logits, weights):
    """jnp oracle: logits [D,B,H,W,C], weights [D] ->
    (var [D,B,H,W] f32, pseudo [B,H,W] i32)."""
    x = logits.astype(jnp.float32)
    softs = jax.nn.softmax(x, axis=-1)
    preds = jnp.mean(softs, axis=0)
    logq = jax.nn.log_softmax(x, axis=-1)
    lp = jnp.log(jnp.maximum(preds, _TINY))
    var = jnp.sum(preds * (lp - logq), axis=-1)
    mix = jnp.einsum("d,dbhwc->bhwc", weights.astype(jnp.float32),
                     jax.lax.stop_gradient(softs))
    return var, jnp.argmax(mix, axis=-1).astype(jnp.int32)


def _softmax_parts(x, n_dec, n_classes):
    """Shared fwd/bwd recompute: per-decoder (max, 1/sum, log sum)."""
    maxes, inv_sums, log_sums = [], [], []
    for d in range(n_dec):
        m = x(d, 0)
        for c in range(1, n_classes):
            m = jnp.maximum(m, x(d, c))
        s = jnp.exp(x(d, 0) - m)
        for c in range(1, n_classes):
            s = s + jnp.exp(x(d, c) - m)
        maxes.append(m)
        inv_sums.append(1.0 / s)
        log_sums.append(jnp.log(s))
    return maxes, inv_sums, log_sums


def _fwd_kernel(w_ref, x_ref, var_ref, ps_ref, *, n_dec, n_classes):
    """x_ref [1, D, C, hs, W] -> var_ref [1, D, hs, W], ps_ref [1, hs, W]."""
    D, C = n_dec, n_classes

    def x(d, c):
        return x_ref[0, d, c].astype(jnp.float32)

    maxes, inv_sums, log_sums = _softmax_parts(x, D, C)
    hs, w = x_ref.shape[-2:]
    ps, lps = [], []
    best_val = jnp.full((hs, w), -1.0, jnp.float32)
    best_idx = jnp.zeros((hs, w), jnp.int32)
    for c in range(C):
        pc = jnp.zeros((hs, w), jnp.float32)
        mix = jnp.zeros((hs, w), jnp.float32)
        for d in range(D):
            sdc = jnp.exp(x(d, c) - maxes[d]) * inv_sums[d]
            pc = pc + sdc
            mix = mix + w_ref[d] * sdc
        pc = pc * (1.0 / D)
        ps.append(pc)
        lps.append(jnp.log(jnp.maximum(pc, _TINY)))
        take = mix > best_val
        best_val = jnp.where(take, mix, best_val)
        best_idx = jnp.where(take, c, best_idx)
    for d in range(D):
        v = jnp.zeros((hs, w), jnp.float32)
        for c in range(C):
            logq = x(d, c) - maxes[d] - log_sums[d]
            v = v + ps[c] * (lps[c] - logq)
        var_ref[0, d] = v
    ps_ref[0] = best_idx


def _bwd_kernel(x_ref, g_ref, dx_ref, *, n_dec, n_classes):
    """x_ref [1,D,C,hs,W], g_ref [1,D,hs,W] -> dx_ref [1,D,C,hs,W]."""
    D, C = n_dec, n_classes

    def x(d, c):
        return x_ref[0, d, c].astype(jnp.float32)

    maxes, inv_sums, log_sums = _softmax_parts(x, D, C)
    gs = [g_ref[0, d].astype(jnp.float32) for d in range(D)]
    g_tot = gs[0]
    for d in range(1, D):
        g_tot = g_tot + gs[d]

    def s(d, c):  # softmax, recomputed (cheaper than storing D*C maps)
        return jnp.exp(x(d, c) - maxes[d]) * inv_sums[d]

    qs = []
    for c in range(C):
        pc = s(0, c)
        r = gs[0] * (x(0, c) - maxes[0] - log_sums[0])
        for d in range(1, D):
            pc = pc + s(d, c)
            r = r + gs[d] * (x(d, c) - maxes[d] - log_sums[d])
        pc = pc * (1.0 / D)
        lp = jnp.log(jnp.maximum(pc, _TINY))
        qs.append((g_tot * (1.0 + lp) - r, pc))
    for d in range(D):
        t = s(d, 0) * qs[0][0]
        for c in range(1, C):
            t = t + s(d, c) * qs[c][0]
        for c in range(C):
            q_c, p_c = qs[c]
            sdc = s(d, c)
            dx_ref[0, d, c] = (gs[d] * (sdc - p_c)
                               + (1.0 / D) * sdc * (q_c - t))


def _slab(h: int) -> int:
    """Spatial slab keeping the [1,D,C,hs,W] block + temporaries in VMEM."""
    for hs in (64, 32, 16, 8):
        if h % hs == 0:
            return hs
    return h


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused(logits, weights, interpret):
    var, pseudo = _fused_fwd(logits, weights, interpret)[0]
    return var, pseudo


def _pallas_fwd(logits, weights, interpret):
    d, b, h, w, c = logits.shape
    x = jnp.transpose(logits.astype(jnp.float32),
                      (1, 0, 4, 2, 3))  # [B, D, C, H, W]
    hs = _slab(h)
    kernel = functools.partial(_fwd_kernel, n_dec=d, n_classes=c)
    var, pseudo = pl.pallas_call(
        kernel,
        grid=(b, h // hs),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d, c, hs, w), lambda i, j: (i, 0, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, d, hs, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hs, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, d, h, w), jnp.float32),
            jax.ShapeDtypeStruct((b, h, w), jnp.int32),
        ],
        interpret=interpret,
    )(weights.astype(jnp.float32), x)
    return jnp.transpose(var, (1, 0, 2, 3)), pseudo


def _fused_fwd(logits, weights, interpret):
    on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu or interpret):
        out = _reference_impl(logits, weights)
    else:
        out = _pallas_fwd(logits, weights, interpret)
    return out, (logits, weights)


def _fused_bwd(interpret, residual, cotangents):
    logits, weights = residual
    dw = jnp.zeros(weights.shape, weights.dtype)  # stopgrad'd constant
    g_var, _ = cotangents  # pseudo is int32 -> float0 cotangent, dropped
    on_tpu = jax.devices()[0].platform == "tpu"
    if not (on_tpu or interpret):
        def f(lg):
            return _reference_impl(lg, weights)[0]
        _, vjp = jax.vjp(f, logits)
        return (vjp(g_var)[0].astype(logits.dtype), dw)
    d, b, h, w, c = logits.shape
    x = jnp.transpose(logits.astype(jnp.float32), (1, 0, 4, 2, 3))
    g = jnp.transpose(g_var.astype(jnp.float32), (1, 0, 2, 3))
    hs = _slab(h)
    kernel = functools.partial(_bwd_kernel, n_dec=d, n_classes=c)
    dx = pl.pallas_call(
        kernel,
        grid=(b, h // hs),
        in_specs=[
            pl.BlockSpec((1, d, c, hs, w), lambda i, j: (i, 0, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, hs, w), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, c, hs, w),
                               lambda i, j: (i, 0, 0, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, c, h, w), jnp.float32),
        interpret=interpret,
    )(x, g)
    dx = jnp.transpose(dx, (1, 0, 3, 4, 2)).astype(logits.dtype)
    return (dx, dw)


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_uncertainty(logits: jax.Array, weights: jax.Array,
                      force_pallas: bool = False):
    """logits [D, B, H, W, C] (any float), weights [D] ->
    (var [D, B, H, W] f32 — differentiable in logits,
     pseudo [B, H, W] i32 — stop-gradient by construction).

    Pallas kernel on TPU; jnp oracle elsewhere (force_pallas runs the
    kernel in interpret mode for tests). `weights` is treated as a
    constant (the reference's Dirichlet draw is data, not a parameter).
    """
    return _fused(logits, jax.lax.stop_gradient(weights),
                  bool(force_pallas))
