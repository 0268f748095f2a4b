"""On-chip compile probe for pallas/pool_nchw.py (VERDICT r3 #3).

The r3a step A/B hit a Mosaic compile FAILURE through remote_compile
(HTTP 500, error text swallowed). This probe compiles the fwd and bwd
kernels in isolation at the production 256px shape and prints the full
exception, so the failing construct can be identified and fixed (or the
kernel deleted with the reason recorded).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_pool_probe.py
"""
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.pallas.pool_nchw import max_pool_2x2_nchw  # noqa: E402


def probe(name, fn, *args):
    try:
        out = jax.jit(fn)(*args)
        val = jax.tree.leaves(out)[0]
        print(f"{name}: OK {val.shape} sum={float(jnp.sum(val)):.3f}",
              flush=True)
        return True
    except Exception:
        print(f"{name}: FAILED", flush=True)
        traceback.print_exc()
        tb = traceback.format_exc()
        # surface the Mosaic line if present
        for ln in tb.splitlines():
            if "osaic" in ln or "INTERNAL" in ln or "nsupported" in ln:
                print("  >>", ln.strip(), flush=True)
        return False


def main():
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 16, 256, 256)), jnp.bfloat16)

    probe("fwd 256px", lambda x: max_pool_2x2_nchw(x), x)

    def loss(x):
        return jnp.sum(max_pool_2x2_nchw(x).astype(jnp.float32) ** 2)

    probe("fwd+bwd 256px", jax.grad(loss), x)

    x2 = jnp.asarray(rng.standard_normal((16, 32, 128, 128)), jnp.bfloat16)
    probe("fwd+bwd 128px", jax.grad(
        lambda x: jnp.sum(max_pool_2x2_nchw(x).astype(jnp.float32) ** 2)),
        x2)


if __name__ == "__main__":
    main()
