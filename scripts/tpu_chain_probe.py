"""On-chip compile isolation for pallas/block_conv.py kernels.

Compiles each chain kernel (fwd plain/bnl, bwd plain/bnl, rate 0/0.5)
in isolation at the production L0 geometry and prints OK/FAILED per
probe, so a step-level Mosaic failure can be pinned to a construct.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_chain_probe.py [probe ...]
"""
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.pallas import block_conv as bc  # noqa: E402


def probe(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        val = jax.tree.leaves(out)[0]
        v = float(jnp.sum(val.astype(jnp.float32)))
        print(f"{name}: OK sum={v:.3f}", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " | ")[:500]
        print(f"{name}: FAILED {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    assert jax.devices()[0].platform == "tpu"
    which = set(sys.argv[1:])
    rng = np.random.default_rng(0)
    B, CIN, COUT, H, W = 16, 16, 16, 256, 256
    x = jnp.asarray(rng.standard_normal((B, CIN, H, W)), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, CIN, COUT)),
                    jnp.float32)
    f = jnp.asarray(0.5 + rng.random(CIN), jnp.float32)
    s = jnp.asarray(0.1 * rng.standard_normal(CIN), jnp.float32)
    seed = jnp.int32(1234)

    def run(name, fn, *args):
        if not which or name in which or any(name.startswith(p)
                                             for p in which):
            probe(name, fn, *args)

    run("fwd_plain", lambda x, w: bc.chain_conv_plain(x, w)[0], x, w)
    run("fwd_bnl_r0",
        lambda x, f, s, w: bc.chain_conv_bnl(x, f, s, w, seed, 0.0)[0],
        x, f, s, w)
    run("fwd_bnl_r5",
        lambda x, f, s, w: bc.chain_conv_bnl(x, f, s, w, seed, 0.5)[0],
        x, f, s, w)

    def loss_plain(x, w):
        y, s1, s2 = bc.chain_conv_plain(x, w)
        return (jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s1)
                + jnp.sum(s2))

    run("bwd_plain", jax.grad(loss_plain, (0, 1)), x, w)

    def loss_bnl(rate):
        def go(x, f, s, w):
            y, s1, s2 = bc.chain_conv_bnl(x, f, s, w, seed, rate)
            return (jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(s1)
                    + jnp.sum(s2))
        return go

    run("bwd_bnl_r0", jax.grad(loss_bnl(0.0), (0, 1, 2, 3)), x, f, s, w)
    run("bwd_bnl_r5", jax.grad(loss_bnl(0.5), (0, 1, 2, 3)), x, f, s, w)


if __name__ == "__main__":
    main()
