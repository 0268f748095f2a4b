"""shard_map training mode: per-device SPMD with explicit collectives.

This is the DEFAULT multi-chip path (RunConfig.use_shard_map=None ->
auto-on for >1 device). The alternative, GSPMD (jit + sharded batches),
partitions everything automatically — EXCEPT pallas_call, which runs
replicated there, silently costing ~2x on the conv-kernel path. Here the
train step runs per-device under jax.shard_map with gradients/metrics/
batch-stats pmean'd over the 'data' axis (each method's make_train_step
takes axis_name), and the Pallas kernels stay active because every device
traces concrete local shapes.

Semantics vs GSPMD mode:
  - Losses are means over the LOCAL shard; pmean of gradients equals the
    gradient of the global-mean loss for equal shard sizes.
  - BatchNorm normalizes per-device batches (the reference's
    nn.DataParallel behavior — GSPMD mode gives sync-BN); running stats
    are pmean'd so the replicated state stays consistent.
  - Per-device randomness is decorrelated by folding the axis index into
    each use key (base.device_keys); global per-step draws (Dirichlet mix
    weights, DCT rotation) stay shared.
Enable with RunConfig.use_shard_map=True.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P


def make_sharded_train_step(method, cfg, model, tx, mesh: Mesh) -> Callable:
    base_step = method.make_train_step(cfg, model, tx, axis_name="data")
    sharded = jax.shard_map(
        base_step, mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=0)
