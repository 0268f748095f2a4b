"""Weight-init helpers (reference utilities/model_initialization.py:5-40).

The reference defines kaiming-normal / xavier-normal / xavier-uniform /
sparse init functions (largely unused — their imports are commented out,
e.g. UAPS_model.py:8). Flax equivalents exposed as a zoo so a config can
swap the conv initializer; `apply_initializer` re-initializes an existing
param tree's conv kernels, the functional analog of the reference's
`*_init_weight(model)` in-place mutation.
"""
from __future__ import annotations

import jax
from flax import linen as nn

INITIALIZERS = {
    # kaiming_normal_(mode='fan_out' for resnet; reference helper uses
    # torch default fan_in)
    "kaiming_normal": nn.initializers.variance_scaling(
        2.0, "fan_in", "truncated_normal"),
    "kaiming_normal_fan_out": nn.initializers.variance_scaling(
        2.0, "fan_out", "truncated_normal"),
    "xavier_normal": nn.initializers.glorot_normal(),
    "xavier_uniform": nn.initializers.glorot_uniform(),
    # torch default Conv2d init (kaiming_uniform with a=sqrt(5))
    "torch_default": nn.initializers.variance_scaling(
        1.0 / 3.0, "fan_in", "uniform"),
    "lecun_normal": nn.initializers.lecun_normal(),
}


def apply_initializer(params, key, name: str = "kaiming_normal"):
    """Re-draw every 4-D conv kernel with the named initializer; biases and
    norm scales untouched (matching the reference helpers' selectivity)."""
    init = INITIALIZERS[name]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(key, len(flat))
    new_leaves = []
    for k, (path, leaf) in zip(keys, flat):
        if leaf.ndim == 4:
            new_leaves.append(init(k, leaf.shape, leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
