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
    this is the TPU-native equivalent entry point.

    On managed clusters jax.distributed.initialize() autodetects; for
    manual launches (and the 2-process CPU test) the coordinator/world
    comes from JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID."""
    import os
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    if os.environ.get("JAX_PLATFORMS", "") == "cpu" or \
            jax.config.jax_platforms == "cpu":
        # CPU multi-process collectives ride gloo (the 2-process test rig)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if nproc is not None:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    else:
        jax.distributed.initialize()


def local_batch_shard(batch: Any) -> Any:
    """Per-host input feed: slice this process's rows out of the global
    batch (SURVEY §2.4/§5.8). Every process builds the same deterministic
    global batch (seeded pipeline), so slicing by process index yields
    disjoint shards with no cross-host coordination; single-process is a
    no-op. Global batch size must divide process_count * local devices."""
    pc = jax.process_count()
    if pc == 1:
        return batch
    pi = jax.process_index()

    def sl(x):
        n = x.shape[0]
        assert n % pc == 0, f"global batch {n} not divisible by {pc} hosts"
        k = n // pc
        return x[pi * k:(pi + 1) * k]

    return jax.tree.map(sl, batch)


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
    if jax.process_count() > 1:
        # multi-host: every process holds the full (identically-seeded)
        # state; assemble global replicated arrays from local copies.
        # PRNG-key leaves round-trip through key_data (typed key arrays
        # cannot cross the numpy boundary directly).
        def place(x):
            if jax.dtypes.issubdtype(getattr(x, "dtype", None),
                                     jax.dtypes.prng_key):
                impl = jax.random.key_impl(x)
                data = jax.make_array_from_process_local_data(
                    rep, np.asarray(jax.random.key_data(x)))
                return jax.random.wrap_key_data(data, impl=impl)
            return jax.make_array_from_process_local_data(
                rep, np.asarray(x))

        return jax.tree.map(place, state)
    return jax.device_put(state, rep)


def _place(x: Any, sh: NamedSharding) -> jax.Array:
    """device_put under one process; assemble a global array from this
    process's local shard when multi-host (the caller feeds the LOCAL rows
    only — see local_batch_shard)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place host batch arrays sharded over the data axis.

    Batch size must be divisible by the mesh size (the host pipeline pads
    or sizes batches accordingly). Multi-host: pass the process-local
    shard (local_batch_shard); each host device_puts only its rows and
    the result is one global sharded array."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: _place(x, sh), batch)


def shard_batch_stacked(batches: Any, mesh: Mesh) -> Any:
    """Place a [K, B, ...] stack of K batches (for a lax.scan multi-step
    dispatch) with the batch axis (axis 1) sharded over 'data'."""
    if "spatial" in mesh.axis_names:
        sh = NamedSharding(mesh, P(None, "data", "spatial"))
    else:
        sh = NamedSharding(mesh, P(None, "data"))
    return jax.tree.map(lambda x: _place(x, sh), batches)
