"""One-shot TPU measurement batch for round 2 (run when the tunnel is up).

Runs, in ONE process (compiles are ~2-4 min each through remote_compile,
so everything is batched):
  1. step A/B of the conv kernel variants from the anatomy study
     (taps baseline vs flat / dwout / dwnp) on the faithful UAPS step
  2. per-method step timing for the full 8-method suite (on the winner)

Writes progress lines to stdout (run with run_in_background and poll).

    PYTHONPATH=/root/.axon_site:/root/repo python -u \
        scripts/tpu_session_r2.py [phase1_variants_csv] [phase2_methods_csv]
"""
import dataclasses
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.data.synthetic import SyntheticDefects, synthetic_batch  # noqa: E402
from uaps_tpu.methods import get_method, base as mbase  # noqa: E402
from uaps_tpu.utils.config import preset  # noqa: E402

BATCH, IMAGE, STEPS, WARM = 16, (256, 256), 20, 3


def time_step(method_name: str, conv_variant: str = "taps") -> float:
    cfg = preset("neu", method=method_name)
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    cfg.model = dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                    conv_variant=conv_variant)
    method = get_method(method_name)
    state, model = method.init_state(cfg, jax.random.key(0))
    tx = mbase.make_optimizer(cfg.optim)
    step = jax.jit(method.make_train_step(cfg, model, tx), donate_argnums=0)
    if method_name == "uaps":
        rng = np.random.default_rng(0)
        b = synthetic_batch(rng, BATCH, IMAGE, 4, 3)
        batch = jax.device_put({"image": b["image"], "label": b["label"],
                                "uimage": b["image"], "ulabel": b["label"]})
    else:
        data = SyntheticDefects(cfg.data, seed=0)
        it = (data.train_iter_weak_strong() if method_name == "ucc"
              else data.train_iter())
        batch = jax.device_put(next(iter(it)))
    t0 = time.perf_counter()
    for _ in range(WARM):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    print(f"  [compile+warm {time.perf_counter() - t0:.0f}s]", flush=True)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"  {method_name}/{conv_variant}: {dt:.1f} ms/step "
          f"(loss {loss:.4f})", flush=True)
    return dt


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu", jax.devices()
    variants = (sys.argv[1].split(",") if len(sys.argv) > 1
                else ["taps", "dwnp", "dwout", "flat"])
    methods = (sys.argv[2].split(",") if len(sys.argv) > 2
               else ["baseline", "mt", "uamt", "cps", "cct", "dct", "ucc"])
    results = {}
    print("=== phase 1: UAPS step, conv variants ===", flush=True)
    for v in variants:
        if not v:
            continue
        try:
            results[f"uaps/{v}"] = time_step("uaps", v)
        except Exception as e:  # Mosaic may reject an untried variant
            print(f"  uaps/{v} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            results[f"uaps/{v}"] = None
        print("PARTIAL", json.dumps(results), flush=True)
    ok = {v: results[f"uaps/{v}"] for v in variants
          if v and results.get(f"uaps/{v}") is not None}
    best = min(ok, key=ok.get) if ok else "taps"
    print(f"=== phase 2: method suite (conv_variant={best}) ===", flush=True)
    for m in methods:
        if not m:
            continue
        try:
            results[f"{m}/{best}"] = time_step(m, best)
        except Exception as e:
            print(f"  {m}/{best} FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)
            results[f"{m}/{best}"] = None
        print("PARTIAL", json.dumps(results), flush=True)
    print("FINAL", json.dumps(results), flush=True)
