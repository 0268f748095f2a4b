"""Anatomy of the dwnp wgrad kernel at the step's hottest shape.

The r4b profile shows the 256px conv1 wgrads (x [16,32,264,256] bf16
prepadded, g [16,16,256,256] bf16 -> dW f32 [9,32,16]) at 0.688 ms/call
x 8/step — ~5.7x their ~0.12 ms DMA floor — the largest single conv
cost. This decomposes the kernel into staged probes (same BlockSpecs,
same grid) so the gap can be attributed before building any variant:

  dmaonly   read x+g blocks, write dW once          -> memory floor
  mm1       + ONE center-tap matmul per block        -> matmul+acc unit
  mm9       + all nine matmuls (center g, wrong math)-> MXU pass count
  roll      + the two masked f32 g-rolls (full math) -> roll cost
  (roll == production dwnp wgrad)

Timing: serial-dependency chains (x perturbed by eps*sum(dW)) at two
lengths, slope taken, one jit per probe — the ~5 ms/dispatch relay tax
cancels in the slope (PERF.md methodology).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_wgrad_anatomy.py [probe ...]
"""
import functools
import os
import sys
import time

INTERP = os.environ.get("WGA_INTERP") == "1"   # CPU math check mode

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from uaps_tpu.pallas.conv3x3_nchw import (  # noqa: E402
    _HOFF, _pick_slab, _wgrad_compiler_params)

B, CIN, COUT, H, W = 16, 32, 16, 256, 256


def _kernel(x_ref, g_ref, o_ref, *, slab, width, cin, cout, stage):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    x = x_ref[0]
    g = g_ref[0].reshape(cout, slab * width)
    if stage == "dmaonly":
        # touch both operands so the DMAs are not dead-code-eliminated
        o_ref[...] += (jnp.sum(x[:, :1, :].astype(jnp.float32))
                       + jnp.sum(g[:1].astype(jnp.float32))) * 0.0
        return
    if stage == "mm1":
        xs = x[:, _HOFF + 1:_HOFF + 1 + slab, :].reshape(cin, slab * width)
        o_ref[4] += jax.lax.dot_general(
            xs, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return
    if stage == "mm9":
        gs = (g, g, g)
    else:  # roll / g3 / one — full production math
        gf = g.astype(jnp.float32)
        n = jax.lax.broadcasted_iota(jnp.int32, gf.shape, 1)
        g0 = jnp.where(n % width == width - 1, 0.0,
                       pltpu.roll(gf, slab * width - 1, 1)).astype(g.dtype)
        g2 = jnp.where(n % width == 0, 0.0,
                       pltpu.roll(gf, 1, 1)).astype(g.dtype)
        gs = (g0, g, g2)
    if stage == "g3":
        # pack the 3 dw taps into matmul N: G3 [3Co, N] (sublane concat
        # of the already-materialized rolls), ONE [cin,N]x[N,3Co] matmul
        # per dh -> [cin, 3Co] = all three dw taps. o_ref [3, cin, 3Co].
        g3 = jnp.concatenate(gs, axis=0)
        for dh in range(3):
            xs = x[:, _HOFF + dh:_HOFF + dh + slab, :].reshape(
                cin, slab * width)
            o_ref[dh] += jax.lax.dot_general(
                xs, g3, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)
        return
    if stage == "one":
        # additionally pack the 3 dh slices into matmul M: X3 [3cin, N]
        # x G3 [3Co, N] -> ONE [3cin, 3Co] matmul = all nine taps.
        g3 = jnp.concatenate(gs, axis=0)
        x3 = jnp.concatenate(
            [x[:, _HOFF + dh:_HOFF + dh + slab, :].reshape(
                cin, slab * width) for dh in range(3)], axis=0)
        o_ref[...] += jax.lax.dot_general(
            x3, g3, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32
        ).reshape(o_ref.shape).astype(o_ref.dtype)
        return
    for dh in range(3):
        xs = x[:, _HOFF + dh:_HOFF + dh + slab, :].reshape(
            cin, slab * width)
        for dw in range(3):
            o_ref[dh * 3 + dw] += jax.lax.dot_general(
                xs, gs[dw], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(o_ref.dtype)


def probe_call(stage, xp, g):
    slab = _pick_slab(H)
    kernel = functools.partial(_kernel, slab=slab, width=W, cin=CIN,
                               cout=COUT, stage=stage)
    out_shape = {"g3": (3, CIN, 3 * COUT),
                 "one": (3 * CIN, 3 * COUT)}.get(stage, (9, CIN, COUT))
    return pl.pallas_call(
        kernel,
        grid=(B, H // slab),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(CIN),
                          pl.Element(slab + 8), pl.Element(W)),
                         lambda bi, si: (bi, 0, si * slab, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, COUT, slab, W), lambda bi, si: (bi, 0, si, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(out_shape,
                               lambda bi, si: (0,) * len(out_shape),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        compiler_params=None if INTERP else _wgrad_compiler_params(),
        interpret=INTERP,
    )(xp, g)


def time_stage(stage, xp, g, n=12):
    def chain(k):
        def run(xp, g):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                dw = probe_call(stage, xp + acc.astype(xp.dtype) * 1e-20, g)
                acc = acc + jnp.sum(dw)
            return acc
        return jax.jit(run)

    many, few = chain(n), chain(n // 3)
    float(many(xp, g)); float(few(xp, g))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(many(xp, g))
    t_many = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        float(few(xp, g))
    t_few = (time.perf_counter() - t0) / reps
    return (t_many - t_few) / (n - n // 3) * 1000


def main():
    rng = np.random.default_rng(0)
    if INTERP:
        # CPU math check: the packed probes must reproduce the
        # production [9, cin, cout] wgrad up to layout
        jax.config.update("jax_platforms", "cpu")
        xp = jnp.asarray(rng.standard_normal((B, CIN, H + 8, W)),
                         jnp.float32)
        g = jnp.asarray(rng.standard_normal((B, COUT, H, W)), jnp.float32)
        ref = np.asarray(probe_call("roll", xp, g))            # [9,ci,co]
        g3 = np.asarray(probe_call("g3", xp, g))               # [3,ci,3co]
        one = np.asarray(probe_call("one", xp, g))             # [3ci,3co]
        g3u = g3.reshape(3, CIN, 3, COUT).transpose(0, 2, 1, 3)
        oneu = one.reshape(3, CIN, 3, COUT).transpose(0, 2, 1, 3)
        refu = ref.reshape(3, 3, CIN, COUT)
        np.testing.assert_allclose(g3u, refu, rtol=1e-5)
        np.testing.assert_allclose(oneu, refu, rtol=1e-5)
        print("interpret math check OK (g3, one == roll)")
        return
    assert jax.devices()[0].platform == "tpu"
    which = sys.argv[1:] or ["dmaonly", "mm1", "mm9", "roll", "g3", "one"]
    xp = jnp.asarray(rng.standard_normal((B, CIN, H + 8, W)), jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((B, COUT, H, W)), jnp.bfloat16)
    for stage in which:
        try:
            ms = time_stage(stage, xp, g)
            print(f"{stage}: {ms:.3f} ms/call", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{stage}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
