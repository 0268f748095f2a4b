"""Training algorithms, one module per method (SURVEY.md §7 layout).

Each method module exposes:
  init_state(cfg, rng)            -> (TrainState, model)
  make_train_step(cfg, model, tx) -> jittable (state, batch) -> (state, metrics)
and shares `base.make_eval_step` for validation.

Registry maps the reference trainer scripts to modules:
  uaps     <- /root/reference/UAPS_train.py
  baseline <- /root/reference/baseline/baseline_train.py
  mt       <- /root/reference/MT/MT_train.py
  uamt     <- /root/reference/UAMT/UA_MT_train.py
  cps      <- /root/reference/CPS/CPS_train.py
  cct      <- /root/reference/CCT/CCT_train.py
  dct      <- /root/reference/DCT/DCT_train.py
  ucc      <- /root/reference/UCC/UCC_train.py
"""
from uaps_tpu.methods import base

_REGISTRY = {}


def get_method(name: str):
    """Lazy import so importing the package stays cheap."""
    if name not in _REGISTRY:
        import importlib
        try:
            _REGISTRY[name] = importlib.import_module(
                f"uaps_tpu.methods.{name}")
        except ModuleNotFoundError as e:
            raise ValueError(f"unknown method {name!r}") from e
    return _REGISTRY[name]


METHODS = ("uaps", "baseline", "mt", "uamt", "cps", "cct", "dct", "ucc")

__all__ = ["base", "get_method", "METHODS"]
