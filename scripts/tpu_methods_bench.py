"""Per-method train-step timing on the real chip — the whole comparison
suite, not just the UAPS headline.

Each method's faithful step (bs16+16 @ 256x256, bf16, default kernels)
is timed in ONE process with the chained-steps + fetched-loss protocol
(PERF.md measurement methodology). Methods are the reference's full
suite: baseline, uaps, mt, uamt, cps, cct, dct, ucc.

    PYTHONPATH=/root/.axon_site:/root/repo python \
        scripts/tpu_methods_bench.py [method ...]
"""
import dataclasses
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.data.synthetic import SyntheticDefects  # noqa: E402
from uaps_tpu.methods import get_method, base as mbase  # noqa: E402
from uaps_tpu.utils.config import preset  # noqa: E402

BATCH, IMAGE, STEPS, WARM = 16, (256, 256), 20, 3
ALL = ["baseline", "uaps", "mt", "uamt", "cps", "cct", "dct", "ucc"]


def measure(method_name: str) -> float:
    cfg = preset("neu", method=method_name)
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    cfg.model = dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    method = get_method(method_name)
    state, model = method.init_state(cfg, jax.random.key(0))
    tx = mbase.make_optimizer(cfg.optim)
    step = jax.jit(method.make_train_step(cfg, model, tx), donate_argnums=0)
    data = SyntheticDefects(cfg.data, seed=0)
    it = (data.train_iter_weak_strong() if method_name == "ucc"
          else data.train_iter())
    batch = jax.device_put(next(iter(it)))
    for _ in range(WARM):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS * 1000
    ips = BATCH / dt * 1000  # labeled imgs/s (uniform across methods)
    print(f"{method_name:9s}: {dt:7.1f} ms/step  {ips:6.0f} labeled "
          f"imgs/s (loss {loss:.4f})", flush=True)
    return dt


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu"
    methods = sys.argv[1:] or ALL
    results = {m: measure(m) for m in methods}
    print("RESULTS", results)
