"""Time wgrad/dgrad kernel variants at the step's hottest conv shapes.

The r2 profile shows the cin=32 @256px wgrads (up4 Conv_0, 8/step) are
the single most expensive conv calls at 0.774 ms — and they run the
'taps' wgrad because _vjp_bwd_nchw reuses the FORWARD variant. This
sweep times wgrad variants (taps/im2col/dhdw) and the dgrad at the hot
shapes so the backward can pick per-shape winners.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_wgrad_sweep.py
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.pallas.conv3x3_nchw import (  # noqa: E402
    conv3x3_nchw, conv3x3_nchw_wgrad)


def time_fn(fn, *args, n=12):
    # serial data dependency: each call's input depends on the previous
    # call's output, so XLA can neither CSE identical calls nor overlap
    # them (first version measured negative slopes from pure CSE)
    def chain(k):
        def run(a0, *rest):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(k):
                out = fn(a0 + acc.astype(a0.dtype) * 1e-20, *rest)
                acc = acc + jnp.sum(out.astype(jnp.float32))
            return acc
        return jax.jit(run)

    many, few = chain(n), chain(n // 3)
    float(many(*args)); float(few(*args))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        float(many(*args))
    t_many = (time.perf_counter() - t0) / reps
    t0 = time.perf_counter()
    for _ in range(reps):
        float(few(*args))
    t_few = (time.perf_counter() - t0) / reps
    return (t_many - t_few) / (n - n // 3) * 1000


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu"
    rng = np.random.default_rng(0)
    shapes = [
        ("cin32@256 (up4 c0)", 32, 16, 256, 256),
        ("cin16@256", 16, 16, 256, 256),
        ("cin48@128 (up3 c0)", 48, 32, 128, 128),
    ]
    for name, cin, cout, h, w in shapes:
        x = jnp.asarray(rng.standard_normal((16, cin, h, w)) * 0.1,
                        jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((16, cout, h, w)) * 0.1,
                        jnp.bfloat16)
        for variant in ("taps", "im2col", "dhdw"):
            per = time_fn(lambda a, b, _v=variant:
                          conv3x3_nchw_wgrad(a, b, False, _v), x, g)
            print(f"wgrad {name} {variant:7s}: {per:6.3f} ms", flush=True)
    # dgrad hot shape: g 16ch -> dx 32ch @256
    wk = jnp.asarray(rng.standard_normal((3, 3, 16, 32)) * 0.1,
                     jnp.bfloat16)
    g = jnp.asarray(rng.standard_normal((16, 16, 256, 256)) * 0.1,
                    jnp.bfloat16)
    for variant in ("taps", "im2col"):
        per = time_fn(lambda a, b, _v=variant:
                      conv3x3_nchw(a, b, False, _v), g, wk)
        print(f"dgrad 16->32@256 {variant:7s}: {per:6.3f} ms", flush=True)
