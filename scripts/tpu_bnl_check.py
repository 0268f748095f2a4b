"""On-chip validation of the fused BN+leaky+conv kernel vs the jnp oracle.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_bnl_check.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.pallas.conv_bnl import conv3x3_bnl, conv3x3_bnl_reference


def check(dtype, b=2, c=16, h=64, w=128, co=16, tol=None):
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((b, c, h, w)), dtype)
    f = jnp.asarray(rng.uniform(0.5, 2.0, (c,)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((c,)) * 0.2, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((3, 3, c, co)) * 0.1, dtype)
    cot = jnp.asarray(rng.standard_normal((b, co, h, w)), dtype)

    out = jax.jit(lambda *a: conv3x3_bnl(*a))(y, f, s, wk)
    ref = jax.jit(lambda *a: conv3x3_bnl_reference(*a))(y, f, s, wk)
    tol = tol or (2e-2 if dtype == jnp.bfloat16 else 2e-5)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) + 1e-9
    assert err / scale < tol, (dtype, err, scale)

    def loss_k(y, f, s, wk):
        return jnp.sum(conv3x3_bnl(y, f, s, wk).astype(jnp.float32)
                       * cot.astype(jnp.float32))

    def loss_r(y, f, s, wk):
        return jnp.sum(conv3x3_bnl_reference(y, f, s, wk).astype(
            jnp.float32) * cot.astype(jnp.float32))

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3)))(y, f, s, wk)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3)))(y, f, s, wk)
    for name, a, bb in zip(("dy", "df", "ds", "dw"), gk, gr):
        a = np.asarray(a, np.float32)
        bb = np.asarray(bb, np.float32)
        scale = np.abs(bb).max() + 1e-9
        rel = np.abs(a - bb).max() / scale
        assert rel < tol * 4, (dtype, name, rel, scale)
        print(f"  {np.dtype(np.float32).name if dtype==jnp.float32 else 'bf16'}"
              f" {name}: max-rel {rel:.2e}")
    print(f"conv3x3_bnl ok for {dtype.__name__} (fwd rel {err/scale:.2e})")


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu", jax.devices()
    check(jnp.float32)
    check(jnp.bfloat16)
    # odd shape: H=256 slab 32, cin 32 (the up3-level shape)
    check(jnp.bfloat16, b=2, c=32, h=128, w=256, co=32)
    print("ALL BNL KERNEL CHECKS PASS on", jax.devices()[0])
