"""Full-step A/B timing on the real chip (the only trustworthy measure —
chained microbenchmarks are polluted by ~5 ms/dispatch relay overhead).

Usage:
    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_step_ab.py \
        [variantA variantB ...]

Each variant is a ModelConfig.conv_backend value ('auto', 'nofuse',
'xla') optionally suffixed with flags, e.g. 'auto@rbg'. Measures the
faithful UAPS SSL step (bs16+16, 256x256, bf16) per variant in ONE
process and prints ms/step.
"""
import dataclasses
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.data.synthetic import synthetic_batch  # noqa: E402
from uaps_tpu.methods import get_method, base as mbase  # noqa: E402
from uaps_tpu.models.unet import max_pool_2x2 as _orig_max_pool  # noqa: E402
from uaps_tpu.utils.config import preset  # noqa: E402

BATCH, IMAGE, STEPS, WARM = 16, (256, 256), 20, 3


def measure(variant: str) -> float:
    import os
    backend, _, flags = variant.partition("@")
    flag_kv = dict(f.split("=", 1) for f in flags.split(",")
                   if "=" in f)
    # env-gated knobs (read at TRACE time, so per-leg setenv works):
    # flatblk=0/1 -> UAPS_FLAT_BLOCKS (ConvBlock flat island, r5)
    # dwk=0 -> UAPS_DWK=0 (restore the 3-matmul dwmf; dwk default r5f)
    os.environ["UAPS_FLAT_BLOCKS"] = flag_kv.get("flatblk", "1")
    os.environ["UAPS_DWK"] = flag_kv.get("dwk", "1")
    import uaps_tpu.models.unet as unet_mod
    import uaps_tpu.pallas.conv3x3_nchw as cmod
    if not hasattr(cmod, "_orig_pick_slab"):
        cmod._orig_pick_slab = cmod._pick_slab
    if "slab" in flag_kv:
        s = int(flag_kv["slab"])
        cmod._pick_slab = (
            lambda h, _s=s: _s if h % _s == 0 else cmod._orig_pick_slab(h))
    else:
        cmod._pick_slab = cmod._orig_pick_slab
    if "xlapool" in flags:
        # force the XLA reduce_window path regardless of shape gate
        unet_mod.max_pool_2x2 = (
            lambda x, layout, backend="auto", pool_backend="auto":
            _orig_max_pool(x, layout, "xla", "xla"))
    else:
        unet_mod.max_pool_2x2 = _orig_max_pool
    cfg = preset("neu", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    # conv_variant: only override when var= is given — the bare legs must
    # measure the production default (dwnp), not a stale hardcode
    mrep = dict(compute_dtype="bfloat16", conv_backend=backend,
                dropout_backend=flag_kv.get("drop", "auto"),
                pool_backend=flag_kv.get("pool", "auto"),
                bn_backend=flag_kv.get("bn", "auto"))
    if "head" in flag_kv:
        # only override when head= is given — bare legs measure the
        # production default (dwmf since r5b)
        mrep["head_variant"] = flag_kv["head"]
    if "var" in flag_kv:
        mrep["conv_variant"] = flag_kv["var"]
    if flag_kv.get("stack") == "1":
        mrep["stack_decoders"] = True
    if flag_kv.get("pack") == "1":
        mrep["packed_heads"] = True
    cfg.model = dataclasses.replace(cfg.model, **mrep)
    mcfg_rep = dict(fused_uncertainty=flag_kv.get("unc", "1") != "0")
    if flag_kv.get("fb") == "1":
        mcfg_rep["fused_batch"] = True
    cfg.method = dataclasses.replace(cfg.method, **mcfg_rep)
    method = get_method("uaps")
    print(f"[{variant}] init...", flush=True)
    state, model = method.init_state(cfg, jax.random.key(0))
    tx = mbase.make_optimizer(cfg.optim)
    step = jax.jit(method.make_train_step(cfg, model, tx), donate_argnums=0)
    print(f"[{variant}] compiling step...", flush=True)
    rng = np.random.default_rng(0)
    b = synthetic_batch(rng, BATCH, IMAGE, 4, 3)
    # device_put ONCE — feeding numpy per step would re-upload ~26 MB
    # through the tunnel every step and dominate the timing
    batch = jax.device_put({"image": b["image"], "label": b["label"],
                            "uimage": b["image"], "ulabel": b["label"]})
    for _ in range(WARM):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        state, metrics = step(state, batch)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{backend}: {dt:.1f} ms/step (loss {loss:.4f})", flush=True)
    return dt


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu"
    variants = sys.argv[1:] or ["auto@xlapool", "auto"]
    results = {}
    for v in variants:
        try:
            results[v] = measure(v)
        except Exception as e:  # noqa: BLE001 — isolate Mosaic rejections
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            results[v] = None
    print("RESULTS", results)
