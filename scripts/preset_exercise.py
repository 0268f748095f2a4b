"""Exercise the DAGM / MTiles / KoSDD2 presets for real (VERDICT r2 #6).

The three non-NEU presets were code-complete + unit-tested but had never
been stepped on TPU or trained to convergence anywhere. Real images for
them don't exist in this environment, so each leg runs the preset's REAL
geometry/semantics (channels, classes, input shape, landscape transpose,
lr, ramp, bs) on synthetic data:

  dagm   : 1-channel input, 7 classes, 256x256, bs16
  mtiles : 3-channel, 6 classes, 256x256, unramped l_uncert, lr 2e-3
  kosdd2 : 3-channel, 2 classes, 256x512 landscape, bs12, rampup 150

Modes:
  tpu — timed faithful train steps per preset at full geometry (idle
        host!), one process (compiles dominate).
  cpu — short convergence runs at reduced 64-px geometry (keeps
        channels/classes/aspect), asserting val mDice learns.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/preset_exercise.py tpu
  JAX_PLATFORMS=cpu python scripts/preset_exercise.py cpu
"""
import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

PRESETS = ("dagm", "mtiles", "kosdd2")


def _cfg(name):
    from uaps_tpu.utils.config import preset
    cfg = preset(name)
    # synthetic fixture with the preset's exact geometry/semantics
    cfg.data = dataclasses.replace(cfg.data, name="synthetic",
                                   image_root="", mask_root="")
    cfg.model = dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    return cfg


def tpu_mode():
    import jax
    import numpy as np
    from uaps_tpu.data.synthetic import synthetic_batch
    from uaps_tpu.methods import get_method, base as mbase

    assert jax.devices()[0].platform == "tpu"
    for name in PRESETS:
        cfg = _cfg(name)
        d = cfg.data
        method = get_method(cfg.method.name)
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = jax.jit(method.make_train_step(cfg, model, tx),
                       donate_argnums=0)
        rng = np.random.default_rng(0)
        b = synthetic_batch(rng, d.batch_size, d.image_size,
                            d.num_classes, d.in_channels)
        batch = jax.device_put({"image": b["image"], "label": b["label"],
                                "uimage": b["image"], "ulabel": b["label"]})
        try:
            for _ in range(3):
                state, metrics = step(state, batch)
            float(metrics["loss"])
            t0 = time.perf_counter()
            for _ in range(10):
                state, metrics = step(state, batch)
            loss = float(metrics["loss"])
            ms = (time.perf_counter() - t0) / 10 * 1000
            print("RESULT " + json.dumps(
                {"preset": name, "ms_per_step": round(ms, 1),
                 "loss": round(loss, 4), "image": list(d.image_size),
                 "bs": d.batch_size, "classes": d.num_classes,
                 "in_ch": d.in_channels}), flush=True)
        except Exception as e:  # noqa: BLE001 — isolate per-preset failures
            print(f"RESULT {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


def cpu_mode():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from uaps_tpu.train import Trainer
    from uaps_tpu.data.synthetic import SyntheticDefects

    for name in PRESETS:
        cfg = _cfg(name)
        h, w = cfg.data.image_size
        cfg.data = dataclasses.replace(
            cfg.data, image_size=(64, 64 * (w // h)), batch_size=8)
        cfg.model = dataclasses.replace(cfg.model, compute_dtype="float32")
        cfg.run = dataclasses.replace(
            cfg.run, epochs=12, iter_per_epoch=15,
            out_dir=f"runs/preset_{name}")
        t = Trainer(cfg)
        t.data = SyntheticDefects(cfg.data, seed=7, labeled_pool=24,
                                  val_pool=32)
        best = t.run()
        print("RESULT " + json.dumps(
            {"preset": name, "best_val_mdice": round(float(best), 4),
             "image": list(cfg.data.image_size),
             "classes": cfg.data.num_classes,
             "in_ch": cfg.data.in_channels}), flush=True)


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    (tpu_mode if mode == "tpu" else cpu_mode)()
