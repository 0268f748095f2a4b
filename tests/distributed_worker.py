"""Worker for the 2-process jax.distributed CPU test (test_distributed.py).

Launched once per process with JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
JAX_PROCESS_ID (or none of them, for the single-process reference run).
Runs N deterministic train steps through the REAL Trainer machinery —
per-host input feed (parallel/mesh.local_batch_shard), global-array
assembly, shard_map step — and dumps the final step metrics plus a params
checksum to a JSON file for the parent to compare.
"""
import dataclasses
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from uaps_tpu.parallel import distributed_init  # noqa: E402

distributed_init()

import numpy as np  # noqa: E402

from uaps_tpu.parallel import local_batch_shard, shard_batch  # noqa: E402
from uaps_tpu.train import Trainer, _train_stream  # noqa: E402
from uaps_tpu.utils.config import preset  # noqa: E402


def main():
    out_path = sys.argv[1]
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    cfg = preset("synthetic", method="baseline")
    cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                   batch_size=8)
    cfg.run = dataclasses.replace(
        cfg.run, out_dir=out_path + ".rundir", epochs=1,
        iter_per_epoch=n_steps)

    t = Trainer(cfg)
    stream = _train_stream(t.data, cfg.method.name)
    metrics = None
    for _ in range(n_steps):
        batch = shard_batch(local_batch_shard(next(stream)), t.mesh)
        t.state, metrics = t.train_step(t.state, batch)

    m = {k: float(v) for k, v in jax.device_get(metrics).items()}
    params_l1 = float(sum(
        np.abs(np.asarray(jax.device_get(x))).sum()
        for x in jax.tree.leaves(t.state.params)))
    with open(out_path, "w") as f:
        json.dump({"metrics": m, "params_l1": params_l1,
                   "ndev": jax.device_count(),
                   "nproc": jax.process_count()}, f)
    print(f"worker done: nproc={jax.process_count()} "
          f"loss={m['loss']:.6f} params_l1={params_l1:.4f}", flush=True)


if __name__ == "__main__":
    main()
