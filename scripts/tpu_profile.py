"""Op-level device profile of the faithful UAPS step on the real chip.

Runs a few steps under jax.profiler (works through the relay — PERF.md),
parses the Chrome trace (plugins/profile/*/*.trace.json.gz), and prints
per-op device-time sums from the 'XLA Ops' leaf track, bucketed by
op-name root, normalized per step.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_profile.py \
        [conv_backend] [out_dir]
"""
import collections
import dataclasses
import glob
import gzip
import json
import re
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.data.synthetic import synthetic_batch  # noqa: E402
from uaps_tpu.methods import get_method, base as mbase  # noqa: E402
from uaps_tpu.utils.config import preset  # noqa: E402

BATCH, IMAGE = 16, (256, 256)
PROF_STEPS = 3


def parse_trace(out_dir: str, steps: int):
    """Sum device times on the 'XLA Ops' leaf track, bucketed by op-name
    root (trailing digits/dots stripped)."""
    traces = sorted(glob.glob(
        out_dir + "/plugins/profile/*/*.trace.json.gz"))
    assert traces, f"no trace under {out_dir}"
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)
    ev = data["traceEvents"]
    tids = {}
    dev_pid = 3
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name" and \
                "TPU" in str(e.get("args", {}).get("name", "")):
            dev_pid = e["pid"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e.get("tid"))] = e["args"]["name"]
    roots = collections.Counter()
    counts = collections.Counter()
    total = 0
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e or e.get("pid") != dev_pid:
            continue
        if tids.get((dev_pid, e.get("tid"))) != "XLA Ops":
            continue
        r = re.sub(r"[.\d]+$", "", e["name"])
        roots[r] += e["dur"]
        counts[r] += 1
        total += e["dur"]
    print(f"device total: {total / 1000 / steps:.1f} ms/step")
    for r, us in roots.most_common(25):
        print(f"  {us / 1000 / steps:7.2f} ms  {counts[r] // steps:5d}"
              f"/step  {r}")
    # un-bucketed: the heaviest INDIVIDUAL ops (full names), to catch a
    # single chunky fusion hiding inside a bucket
    indiv = collections.Counter()
    icnt = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e or e.get("pid") != dev_pid:
            continue
        if tids.get((dev_pid, e.get("tid"))) != "XLA Ops":
            continue
        indiv[e["name"]] += e["dur"]
        icnt[e["name"]] += 1
    print("top individual ops:")
    for name, us in indiv.most_common(20):
        print(f"  {us / 1000 / steps:7.3f} ms  {icnt[name] // steps:4d}"
              f"/step  {name[:100]}")


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "auto"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/uaps_profile"
    # same variant@flags syntax as tpu_step_ab.py (pack=1, pool=, drop=)
    backend, _, flags = variant.partition("@")
    flag_kv = dict(f.split("=", 1) for f in flags.split(",") if "=" in f)
    cfg = preset("neu", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    cfg.model = dataclasses.replace(
        cfg.model, compute_dtype="bfloat16", conv_backend=backend,
        packed_heads=flag_kv.get("pack") == "1",
        pool_backend=flag_kv.get("pool", "auto"),
        dropout_backend=flag_kv.get("drop", "auto"))
    method = get_method("uaps")
    state, model = method.init_state(cfg, jax.random.key(0))
    tx = mbase.make_optimizer(cfg.optim)
    step = jax.jit(method.make_train_step(cfg, model, tx), donate_argnums=0)
    rng = np.random.default_rng(0)
    b = synthetic_batch(rng, BATCH, IMAGE, 4, 3)
    batch = jax.device_put({"image": b["image"], "label": b["label"],
                            "uimage": b["image"], "ulabel": b["label"]})
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    t0 = time.perf_counter()
    jax.profiler.start_trace(out_dir)
    for _ in range(PROF_STEPS):
        state, metrics = step(state, batch)
    float(metrics["loss"])
    jax.profiler.stop_trace()
    wall = (time.perf_counter() - t0) / PROF_STEPS * 1000
    print(f"wall (incl. tracing): {wall:.1f} ms/step ({backend})")
    parse_trace(out_dir, PROF_STEPS)


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu"
    main()
