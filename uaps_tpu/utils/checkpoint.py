"""Orbax checkpointing: step-indexed save/restore with keep-best + resume.

The reference only saves best-val weights and cannot resume
(UAPS_train.py:437-450, SURVEY.md §5.3-5.4); here the FULL train state
(params, batch_stats, opt state, EMA, PRNG key, step) round-trips, plus a
small JSON of host-side scheduler/best-metric state.
"""
from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 2):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep,
                best_fn=lambda m: m.get("val_mdice", 0.0),
                best_mode="max",
            ),
        )

    def save(self, step: int, state: Any, host_state: Optional[dict] = None,
             metrics: Optional[dict] = None):
        self._mngr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(state),
                host=ocp.args.JsonSave(host_state or {}),
            ),
            metrics={k: float(v) for k, v in (metrics or {}).items()},
        )

    def wait(self):
        self._mngr.wait_until_finished()

    def restore(self, abstract_state: Any, step: Optional[int] = None):
        """Restore (state, host_state); step=None -> latest.

        Abstract leaves get an explicit single-device sharding for the
        CURRENT backend: without it orbax falls back to the sharding
        recorded at save time, which fails when restoring a TPU-written
        checkpoint on CPU (or vice versa)."""
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            return None, None
        sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

        def _with_sharding(leaf):
            if isinstance(leaf, jax.ShapeDtypeStruct) and \
                    leaf.sharding is None:
                return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                            sharding=sharding)
            return leaf

        abstract_state = jax.tree.map(_with_sharding, abstract_state)
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract_state),
                host=ocp.args.JsonRestore(),
            ),
        )
        return restored["state"], restored["host"]

    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def close(self):
        self._mngr.close()
