"""Test-time augmentation helpers shared by eval.py and serve.py.

The U-Net family flip-TTA (mean softmax over the four H/V flip
combinations) mirrors the spirit of the reference's BaseNet multi-scale
flip harness (utilities/base.py:23-46); BaseNet models use their own
`tta=True` apply path instead.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def flip_tta_softmax(forward: Callable, variables, image: jax.Array
                     ) -> jax.Array:
    """Mean softmax over the 4 H/V flips of an NHWC batch.

    `forward(variables, image) -> logits [B,H,W,C]`. Returns probs
    [B,H,W,C] (sums to 1; argmax/metric semantics match plain logits).
    """
    total = None
    for fh, fv in ((False, False), (True, False),
                   (False, True), (True, True)):
        cur = image[:, :, ::-1] if fh else image
        cur = cur[:, ::-1] if fv else cur
        p = jax.nn.softmax(forward(variables, cur), axis=-1)
        p = p[:, :, ::-1] if fh else p
        p = p[:, ::-1] if fv else p
        total = p if total is None else total + p
    return total / 4.0
