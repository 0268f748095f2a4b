"""Device-mesh data parallelism over ICI (SURVEY.md §2.4, §5.8).

Replaces the reference's single-process nn.DataParallel
(UAPS_model.py:13, CPS_model.py:22-23) with jit-sharded SPMD: batch arrays
sharded over the 'data' mesh axis, state replicated, gradient reduction
inserted by XLA as ICI collectives.
"""
from uaps_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_batch_stacked,
    local_batch_shard,
    replicate_state,
    batch_sharding,
    distributed_init,
)

__all__ = ["make_mesh", "shard_batch", "shard_batch_stacked",
           "local_batch_shard",
           "replicate_state", "batch_sharding", "distributed_init"]
