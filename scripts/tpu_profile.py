"""Op-level device profile of the faithful UAPS step on the real chip.

Runs a few steps under jax.profiler (works through the relay — PERF.md),
parses the Chrome trace (plugins/profile/*/vm.trace.json.gz, pid 3 =
TPU device), and prints per-op device-time sums bucketed by category,
normalized per step.

    PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_profile.py \
        [conv_backend] [out_dir]
"""
import collections
import dataclasses
import glob
import gzip
import json
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


def categorize(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "pallas" in n or "conv3x3" in n \
            or "bnl" in n or "tpu_custom_call" in n:
        return "pallas custom calls"
    if "convolution" in n or "conv_general" in n:
        return "xla convs"
    if "transpose" in n or "copy" in n or "data formatting" in n:
        return "copies/transposes"
    if "pad" in n:
        return "pads"
    if "reduce-window" in n or "select-and-scatter" in n:
        return "maxpool fwd+bwd"
    if "convert" in n and "reduce" in n:
        return "convert_reduce (BN stats)"
    if "fusion" in n:
        return "xla fusions"
    if "dot" in n:
        return "dots"
    return "misc"


def main():
    backend = sys.argv[1] if len(sys.argv) > 1 else "auto"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/uaps_profile"
    cfg = preset("neu", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    cfg.model = dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                    conv_backend=backend)
    method = get_method("uaps")
    state, model = method.init_state(cfg, jax.random.key(0))
    tx = mbase.make_optimizer(cfg.optim)
    step = jax.jit(method.make_train_step(cfg, model, tx), donate_argnums=0)
    rng = np.random.default_rng(0)
    b = synthetic_batch(rng, BATCH, IMAGE, 4, 3)
    batch = {"image": b["image"], "label": b["label"],
             "uimage": b["image"], "ulabel": b["label"]}
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
    print(f"wall: {wall:.1f} ms/step ({backend})")

    traces = sorted(glob.glob(
        out_dir + "/plugins/profile/*/*.trace.json.gz"))
    assert traces, f"no trace under {out_dir}"
    with gzip.open(traces[-1], "rt") as fh:
        data = json.load(fh)
    # device pid: the one whose name mentions TPU, else pid 3
    dev_pids = {e.get("pid") for e in data["traceEvents"]
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))}
    cats = collections.Counter()
    counts = collections.Counter()
    names = collections.Counter()
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        if not dev_pids and e.get("pid") != 3:
            continue
        c = categorize(e.get("name", ""))
        cats[c] += e["dur"]
        counts[c] += 1
        names[e.get("name", "")[:60]] += e["dur"]
    total = sum(cats.values()) / 1000 / PROF_STEPS
    print(f"device total: {total:.1f} ms/step")
    for c, us in cats.most_common():
        print(f"  {us / 1000 / PROF_STEPS:7.2f} ms  {c}  "
              f"({counts[c] // PROF_STEPS} calls/step)")
    print("top ops:")
    for n, us in names.most_common(12):
        print(f"  {us / 1000 / PROF_STEPS:7.2f} ms  {n}")


if __name__ == "__main__":
    assert jax.devices()[0].platform == "tpu"
    main()
