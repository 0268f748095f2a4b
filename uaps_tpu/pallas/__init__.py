"""Pallas TPU kernels for the UAPS hot ops (SURVEY.md §2.5 plan).

  fused_pseudo_label   — softmax-mix-argmax over the D decoder logits in
                         one VMEM pass (the stop-gradient pseudo-label path
                         of UAPS_train.py:251-255)
  fused_dropout        — inverted dropout with on-core PRNG and a
                         mask-REGENERATING custom VJP: the backward pass
                         re-seeds the same PRNG instead of storing the
                         mask, so the perturbation costs zero residual HBM.

Each kernel has a reference jnp implementation (used on CPU and as the
numerical oracle in tests) selected automatically by platform.
"""
from uaps_tpu.pallas.pseudo_label import fused_pseudo_label
from uaps_tpu.pallas.perturb import fused_dropout
from uaps_tpu.pallas.uncertainty import fused_uncertainty

__all__ = ["fused_pseudo_label", "fused_dropout", "fused_uncertainty"]
