"""Mesh construction and sharding rules.

Design (SURVEY.md §2.4): the workload is a 3.7M-param conv net — weights
replicate everywhere many times over, so the mesh is 1-D ('data') and the
only sharded axis is the batch. Under `jax.jit` with these shardings XLA
inserts the gradient all-reduce over ICI automatically; BatchNorm reduces
over the global batch (sync-BN — a documented deviation from DataParallel's
per-replica stats, strictly more deterministic).

A 'model' axis is left in the API (mesh_shape=(dp, mp)) so spatial/channel
sharding can be added for very large inputs without changing callers, but
per SURVEY §2.4 it is not populated speculatively.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init():
    """Multi-host init (one process per host on a pod slice). No-op when
    single-process. The reference has no multi-node story (SURVEY §2.4);
    this is the TPU-native equivalent entry point."""
    import os
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(num_devices: Optional[int] = None,
              devices: Optional[Any] = None, spatial: int = 1) -> Mesh:
    """Device mesh: 1-D ('data',) by default, or 2-D ('data', 'spatial')
    when spatial > 1.

    The spatial axis shards the image H dimension; XLA GSPMD inserts the
    conv halo exchanges automatically, making it the sequence/context-
    parallel analog for conv segmentation (SURVEY.md §5.7) — used when a
    single image's activations exceed one chip's HBM.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    devices = np.asarray(devices)
    if spatial > 1:
        assert devices.size % spatial == 0, (devices.size, spatial)
        return Mesh(devices.reshape(devices.size // spatial, spatial),
                    axis_names=("data", "spatial"))
    return Mesh(devices, axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Input-array sharding: batch over 'data', image H over 'spatial'
    (when the mesh has one)."""
    if "spatial" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/opt state) across the mesh."""
    rep = NamedSharding(mesh, P())
    return jax.device_put(state, rep)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place host batch arrays sharded over the data axis.

    Batch size must be divisible by the mesh size (the host pipeline pads
    or sizes batches accordingly)."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_batch_stacked(batches: Any, mesh: Mesh) -> Any:
    """Place a [K, B, ...] stack of K batches (for a lax.scan multi-step
    dispatch) with the batch axis (axis 1) sharded over 'data'."""
    if "spatial" in mesh.axis_names:
        sh = NamedSharding(mesh, P(None, "data", "spatial"))
    else:
        sh = NamedSharding(mesh, P(None, "data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batches)
