"""Hyperparameter ramp schedules.

Pinned to /root/reference/utilities/ramps.py (Curious AI mean-teacher ramps).
All functions are jnp-based and jit-safe: `current` may be a traced scalar
(so consistency weights can be computed *inside* the train step from the step
counter instead of being host-fed like the reference's
get_current_consistency_weight_* at UAPS_train.py:81-87).
"""
from __future__ import annotations

import jax.numpy as jnp


def sigmoid_rampup(current, rampup_length):
    """exp(-5 (1 - t/T)^2), clipped; == 1 when T == 0 (ramps.py:19-26)."""
    if isinstance(rampup_length, (int, float)) and rampup_length == 0:
        return jnp.asarray(1.0, dtype=jnp.float32)
    current = jnp.clip(
        jnp.asarray(current, dtype=jnp.float32), 0.0, rampup_length
    )
    phase = 1.0 - current / rampup_length
    return jnp.exp(-5.0 * phase * phase)


def linear_rampup(current, rampup_length):
    """min(t/T, 1) (ramps.py:29-35)."""
    if isinstance(rampup_length, (int, float)) and rampup_length == 0:
        return jnp.asarray(1.0, dtype=jnp.float32)
    current = jnp.asarray(current, dtype=jnp.float32)
    return jnp.clip(current / rampup_length, 0.0, 1.0)


def cosine_rampdown(current, rampdown_length):
    """0.5 (cos(pi t/T) + 1) (ramps.py:38-41)."""
    current = jnp.asarray(current, dtype=jnp.float32)
    return 0.5 * (jnp.cos(jnp.pi * current / rampdown_length) + 1.0)
