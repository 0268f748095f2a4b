"""On-chip contract check for the fused perturbation kernels.

tests/test_pallas.py::TestFusedPerturbKernels is skipped on the CPU test
rig (interpret-mode PRNG yields zeros); this script runs the same
contracts on the real TPU:

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_perturb_check.py
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.pallas.perturb import (  # noqa: E402
    _dropout_call, _fdrop_call, _noise_call,
    fused_dropout, fused_feature_dropout, fused_feature_noise,
)


def check_dropout():
    x = jnp.ones((4, 8, 16, 128))
    seed = jnp.asarray(11, jnp.int32)
    out = np.asarray(_dropout_call(seed, x, 0.5, False))
    zf = (out == 0).mean()
    assert abs(zf - 0.5) < 0.02, zf
    np.testing.assert_allclose(out[out != 0], 2.0, rtol=1e-6)
    assert not np.array_equal(out[0], out[1]), "per-example masks equal"
    np.testing.assert_array_equal(
        out, np.asarray(_dropout_call(seed, x, 0.5, False)))
    # fwd/bwd mask consistency through the public API
    xr = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 8, 16, 128)).astype(np.float32))
    o, vjp = jax.vjp(lambda v: fused_dropout(v, seed, 0.5), xr)
    (gx,) = vjp(jnp.ones_like(o))
    np.testing.assert_array_equal(np.asarray(o != 0), np.asarray(gx != 0))
    print(f"dropout ok (zero_frac={zf:.3f})")


def check_noise():
    x = jnp.ones((3, 8, 16, 128))
    seed = jnp.asarray(21, jnp.int32)
    out = np.asarray(_noise_call(seed, x, 0.3, False))
    f = out - 1.0
    assert f.min() >= -0.3 - 1e-6 and f.max() < 0.3 + 1e-6, (f.min(), f.max())
    assert abs(f.mean()) < 0.01, f.mean()
    np.testing.assert_array_equal(out[0], out[1])
    # bwd regenerates the same noise: dx == out when x == 1
    o, vjp = jax.vjp(lambda v: fused_feature_noise(v, seed, 0.3), x)
    (gx,) = vjp(jnp.ones_like(o))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(o), rtol=1e-5)
    print(f"feature_noise ok (mean={f.mean():+.4f})")


def check_fdrop():
    for ax in (1, 3):
        x = jnp.asarray(np.abs(np.random.default_rng(5).standard_normal(
            (2, 8, 16, 128))).astype(np.float32))
        seed = jnp.asarray(31, jnp.int32)
        out = np.asarray(_fdrop_call(seed, x, ax, False))
        xn = np.asarray(x)
        att = xn.mean(axis=ax, keepdims=True)
        for b in range(2):
            a_b = np.broadcast_to(att[b], xn[b].shape)
            dropped = (out[b] == 0) & (xn[b] != 0)
            kept = out[b] != 0
            assert dropped.any() and kept.any()
            t_lo, t_hi = a_b[kept].max(), a_b[dropped].min()
            assert t_hi >= t_lo - 1e-5, (t_lo, t_hi)
            mx = att[b].max()
            assert 0.7 * mx - 1e-5 <= t_hi <= 0.9 * mx + 1e-5, (t_hi, mx)
            np.testing.assert_allclose(out[b][kept], xn[b][kept], rtol=1e-6)
        # bwd mask matches fwd mask
        o, vjp = jax.vjp(lambda v: fused_feature_dropout(v, seed, ax), x)
        (gx,) = vjp(jnp.ones_like(o))
        np.testing.assert_array_equal(np.asarray(o != 0),
                                      np.asarray(gx != 0))
    print("feature_dropout ok (both axes)")


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu", jax.devices()
    check_dropout()
    check_noise()
    check_fdrop()
    print("ALL PERTURB KERNEL CONTRACTS PASS on", jax.devices()[0])
