"""Calibrate TestMultiChipConvergence at the production-like regime
(VERDICT r3 #5): per-device batch 8 (global 64 on the 8-device CPU
mesh), 64px pools, 120 steps, all three modes — prints the val mDice
triple + wall time per mode so the test's floor/band can be set from
measurements rather than hope.

Usage: python scripts/multichip_calibrate.py [n_steps] [seeds...]
"""
import dataclasses
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
import os  # noqa: E402

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

from uaps_tpu.data.synthetic import SyntheticDefects  # noqa: E402
from uaps_tpu.methods import get_method, base as mbase  # noqa: E402
from uaps_tpu.parallel import (make_mesh, replicate_state,  # noqa: E402
                               shard_batch)
from uaps_tpu.parallel.shardmap_step import make_sharded_train_step  # noqa: E402
from uaps_tpu.utils.config import preset  # noqa: E402

N_STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 120
_rest = sys.argv[2:]
MODES = [a for a in _rest if not a.lstrip("-").isdigit()] or \
    ["single", "shard_map", "gspmd"]
SEEDS = [int(s) for s in _rest if s.lstrip("-").isdigit()] or [0]


def trajectory(mode, seed):
    cfg = preset("synthetic", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, image_size=(64, 64),
                                   batch_size=64)
    method = get_method("uaps")
    state, model = method.init_state(cfg, jax.random.key(seed))
    tx = mbase.make_optimizer(cfg.optim)
    if mode == "shard_map":
        mesh = make_mesh(8)
        step = make_sharded_train_step(method, cfg, model, tx, mesh)
    else:
        mesh = make_mesh(8 if mode == "gspmd" else 1)
        step = jax.jit(method.make_train_step(cfg, model, tx))
    state = replicate_state(state, mesh)
    data = SyntheticDefects(cfg.data, seed=7, labeled_pool=24)
    stream = data.train_iter()
    t0 = time.perf_counter()
    for _ in range(N_STEPS):
        state, metrics = step(state, shard_batch(next(stream), mesh))
    assert np.isfinite(float(metrics["loss"]))
    eval_step = mbase.make_eval_step(cfg, model)
    dices = [float(jax.device_get(eval_step(
        state.params, state.batch_stats, b))["val_mdice"])
        for b in data.val_iter(num_batches=3)]
    wall = time.perf_counter() - t0
    return float(np.mean(dices)), wall


def main():
    for seed in SEEDS:
        res = {}
        for mode in MODES:
            d, wall = trajectory(mode, seed)
            res[mode] = d
            print(f"seed {seed} {mode}: mDice {d:.4f} ({wall:.0f}s)",
                  flush=True)
        if {"single", "shard_map", "gspmd"} <= res.keys():
            print(f"seed {seed} deltas: |sm-1dev|="
                  f"{abs(res['shard_map'] - res['single']):.4f} "
                  f"|gs-1dev|={abs(res['gspmd'] - res['single']):.4f}",
                  flush=True)


if __name__ == "__main__":
    main()
