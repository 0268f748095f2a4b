"""Anatomy of the conv3x3 NCHW kernel's per-call time on the real chip.

The r2 profile shows 42 ms/step of plain conv custom calls with L0 calls
at 0.77 ms each vs a ~0.08 ms raw-DMA floor. This study isolates where
that goes by timing stripped-down kernel variants at the L0 shape
([16,16,256,256] bf16, 16->16):

  taps      current production kernel (9 lane+sublane-offset slices)
  noshift   9 matmuls, all reading ONE aligned slice (no relayouts;
            wrong numbers, right cost model)
  shift3    3 lane-shifted copies up front, taps take sublane-only slices
  matmul1   a single aligned matmul (per-matmul cost)
  dmaonly   copy center slice to output (memory-system floor)
  slab64    taps with 64-row slabs (half the grid steps)

Method: chain N self-composing calls (16->16) in one jit and take the
slope between N=24 and N=8 — the ~5 ms relay dispatch and any fixed
overhead cancel exactly.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_conv_anatomy.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

B, C, H, W = 16, 16, 256, 256
_HOFF = 3


def _kernel(x_ref, w_ref, o_ref, *, slab, mode):
    x = x_ref[0]
    acc = jnp.zeros((C, slab * W), jnp.float32)
    if mode == "dmaonly":
        o_ref[0] = x[:, _HOFF:_HOFF + slab, 1:1 + W]
        return
    if mode == "matmul1":
        xs = x[:, 0:slab, 0:W].reshape(C, slab * W)
        acc = jax.lax.dot_general(w_ref[0], xs, (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[0] = acc.reshape(C, slab, W).astype(o_ref.dtype)
        return
    if mode == "noshift":
        xs = x[:, 0:slab, 0:W].reshape(C, slab * W)
        for t in range(9):
            acc = acc + jax.lax.dot_general(
                w_ref[t], xs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        o_ref[0] = acc.reshape(C, slab, W).astype(o_ref.dtype)
        return
    if mode == "shift3":
        xs_dw = [x[:, :, dw:dw + W] for dw in range(3)]  # 3 lane shifts
        for dh in range(3):
            for dw in range(3):
                xs = xs_dw[dw][:, _HOFF + dh:_HOFF + dh + slab, :]
                acc = acc + jax.lax.dot_general(
                    w_ref[dh * 3 + dw], xs.reshape(C, slab * W),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        o_ref[0] = acc.reshape(C, slab, W).astype(o_ref.dtype)
        return
    if mode == "dwout":
        # one slice per dh (sublane-offset only, dw fixed at center);
        # dw=0/2 contributions land via masked lane-rolls of f32 partial
        # accumulators — 3 relayouts instead of 9
        accs = [jnp.zeros((C, slab * W), jnp.float32) for _ in range(3)]
        for dh in range(3):
            xs = x[:, _HOFF + dh:_HOFF + dh + slab, 1:1 + W]
            xr = xs.reshape(C, slab * W)
            for dw in range(3):
                accs[dw] = accs[dw] + jax.lax.dot_general(
                    w_ref[dh * 3 + dw], xr, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        n = jax.lax.broadcasted_iota(jnp.int32, (C, slab * W), 1)
        # y[w] += A_dw[w + dw - 1]: A_0 rolls right (+1), A_2 left (-1);
        # the wrapped column is exactly the padded-edge contribution -> 0
        left = jnp.where(n % W != 0, pltpu.roll(accs[0], 1, 1), 0.0)
        right = jnp.where(n % W != W - 1, pltpu.roll(accs[2], -1, 1), 0.0)
        acc = accs[1] + left + right
        o_ref[0] = acc.reshape(C, slab, W).astype(o_ref.dtype)
        return
    # taps (production)
    for dh in range(3):
        for dw in range(3):
            xs = x[:, _HOFF + dh:_HOFF + dh + slab, dw:dw + W]
            acc = acc + jax.lax.dot_general(
                w_ref[dh * 3 + dw], xs.reshape(C, slab * W),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    if mode == "flatout":
        o_ref[0] = acc.astype(o_ref.dtype)   # flat [C, slab*W] block
        return
    o_ref[0] = acc.reshape(C, slab, W).astype(o_ref.dtype)


def conv_variant(x, w9, mode, slab=32):
    xp = jnp.pad(x, ((0, 0), (0, 0), (4, 4), (1, 1)))
    kern = functools.partial(_kernel, slab=slab, mode=mode)
    if mode == "flatout":
        out_specs = pl.BlockSpec((1, C, slab * W),
                                 lambda bi, si: (bi, 0, si),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, C, H * W), x.dtype)
    else:
        out_specs = pl.BlockSpec((1, C, slab, W),
                                 lambda bi, si: (bi, 0, si, 0),
                                 memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, C, H, W), x.dtype)
    y = pl.pallas_call(
        kern,
        grid=(B, H // slab),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(C),
                          pl.Element(slab + 8), pl.Element(W + 2)),
                         lambda bi, si: (bi, 0, si * slab, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=False,
    )(xp, w9)
    return y.reshape(B, C, H, W)  # bitcast for flatout, no-op otherwise


def time_chain(mode, slab, n):
    @jax.jit
    def chain(x, w9):
        for _ in range(n):
            x = conv_variant(x, w9, mode, slab)
        return jnp.sum(x.astype(jnp.float32))

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, C, H, W)) * 0.1, jnp.bfloat16)
    w9 = jnp.asarray(rng.standard_normal((9, C, C)) * 0.05, jnp.bfloat16)
    float(chain(x, w9))  # compile + warm
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(chain(x, w9))
    return (time.perf_counter() - t0) / reps


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu"
    modes = [("taps", 32), ("noshift", 32), ("shift3", 32),
             ("matmul1", 32), ("dmaonly", 32), ("taps", 64)]
    if len(sys.argv) > 1:  # e.g. "flatout,dwout" to run only those
        modes = [(m, 32) for m in sys.argv[1].split(",")]
    for mode, slab in modes:
        t8 = time_chain(mode, slab, 8)
        t24 = time_chain(mode, slab, 24)
        per = (t24 - t8) / 16 * 1000
        print(f"{mode:8s} slab={slab:3d}: {per:6.3f} ms/call "
              f"(t8={t8 * 1000:.1f} t24={t24 * 1000:.1f})", flush=True)
