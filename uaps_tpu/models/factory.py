"""Model factory: one registry replacing the reference's four factories.

Reference factories: utilities/UAPS_net_factory.py:5-13 ('unet',
'unet_uaps'), utilities/m_net_factory.py:5-16 ('unet_f','unet_g','unet_h'),
CCT/net_factory.py ('unet_cct'), UCC/UCC_net_factory.py ('unet_ucc'),
plus the per-method copies. The reference's DAGM variant requests
'unet_ccps' from a factory that doesn't know it and silently gets None
(SURVEY.md §2.3) — here every name is registered and unknown names raise.
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp

from uaps_tpu.models.unet import (
    UNet,
    MultiDecoderUNet,
    DeepSupervisionUNet,
)

# name -> constructor(num_classes, dtype) -> nn.Module
MODEL_REGISTRY: Dict[str, Callable[..., Any]] = {}


def _register(name):
    def deco(fn):
        MODEL_REGISTRY[name] = fn
        return fn
    return deco


@_register("unet")
def _unet(num_classes: int, dtype=jnp.float32, remat: bool = False,
          nchw_levels: int = 0, conv_backend: str = "auto",
          conv_variant: str = "taps", head_variant: str = "taps",
          dropout_backend: str = "auto",
          pool_backend: str = "auto", bn_backend: str = "auto"):
    return UNet(num_classes=num_classes, dtype=dtype, remat=remat,
                nchw_levels=nchw_levels, conv_backend=conv_backend,
                conv_variant=conv_variant, head_variant=head_variant,
                dropout_backend=dropout_backend,
                pool_backend=pool_backend, bn_backend=bn_backend)


@_register("unet_uaps")
def _unet_uaps(num_classes: int, dtype=jnp.float32, n_aux: int = 3,
               remat: bool = False, nchw_levels: int = 0,
               conv_backend: str = "auto", conv_variant: str = "taps",
               head_variant: str = "taps", dropout_backend: str = "auto",
               pool_backend: str = "auto", bn_backend: str = "auto",
               packed_heads: bool = False):
    """UAPS net; n_aux in {2,3,4} per the paper's ablation
    (UAPS_train.py:139 comments). kinds cycle through the reference order."""
    base = ("feature_noise", "dropout", "feature_dropout")
    kinds = tuple(base[i % 3] for i in range(n_aux))
    return MultiDecoderUNet(num_classes=num_classes, perturbations=kinds,
                            dtype=dtype, remat=remat,
                            nchw_levels=nchw_levels,
                            conv_backend=conv_backend,
                            conv_variant=conv_variant,
                            head_variant=head_variant,
                            dropout_backend=dropout_backend,
                            pool_backend=pool_backend,
                            bn_backend=bn_backend,
                            packed_heads=packed_heads)


@_register("unet_cct")
def _unet_cct(num_classes: int, dtype=jnp.float32, remat: bool = False,
              nchw_levels: int = 0, conv_backend: str = "auto",
              conv_variant: str = "taps", head_variant: str = "taps",
              dropout_backend: str = "auto",
              pool_backend: str = "auto", bn_backend: str = "auto",
              packed_heads: bool = False):
    # arch-identical to unet_uaps (CCT/CCT_unet.py:261-286)
    return MultiDecoderUNet(num_classes=num_classes, dtype=dtype,
                            remat=remat, nchw_levels=nchw_levels,
                            conv_backend=conv_backend,
                            conv_variant=conv_variant,
                            head_variant=head_variant,
                            dropout_backend=dropout_backend,
                            pool_backend=pool_backend,
                            bn_backend=bn_backend,
                            packed_heads=packed_heads)


@_register("unet_ucc")
def _unet_ucc(num_classes: int, dtype=jnp.float32, remat: bool = False,
              nchw_levels: int = 0, conv_backend: str = "auto",
              conv_variant: str = "taps", head_variant: str = "taps",
              dropout_backend: str = "auto",
              pool_backend: str = "auto", bn_backend: str = "auto",
              packed_heads: bool = False):
    return MultiDecoderUNet(num_classes=num_classes,
                            perturbations=("feature_noise",), dtype=dtype,
                            remat=remat, nchw_levels=nchw_levels,
                            conv_backend=conv_backend,
                            conv_variant=conv_variant,
                            head_variant=head_variant,
                            dropout_backend=dropout_backend,
                            pool_backend=pool_backend,
                            bn_backend=bn_backend,
                            packed_heads=packed_heads)


@_register("unet_ccps")
def _unet_ccps(num_classes: int, dtype=jnp.float32, remat: bool = False,
               nchw_levels: int = 0, conv_backend: str = "auto",
               conv_variant: str = "taps", head_variant: str = "taps",
               dropout_backend: str = "auto",
               pool_backend: str = "auto", bn_backend: str = "auto",
               packed_heads: bool = False):
    return MultiDecoderUNet(num_classes=num_classes,
                            perturbations=("feature_dropout",), dtype=dtype,
                            remat=remat, nchw_levels=nchw_levels,
                            conv_backend=conv_backend,
                            conv_variant=conv_variant,
                            head_variant=head_variant,
                            dropout_backend=dropout_backend,
                            pool_backend=pool_backend,
                            bn_backend=bn_backend,
                            packed_heads=packed_heads)


@_register("unet_f")
def _unet_f(num_classes: int, dtype=jnp.float32, remat: bool = False,
            conv_backend: str = "auto", conv_variant: str = "taps"):
    return DeepSupervisionUNet(num_classes=num_classes, perturbation="none",
                               dtype=dtype, remat=remat,
                               conv_backend=conv_backend,
                               conv_variant=conv_variant)


@_register("unet_g")
def _unet_g(num_classes: int, dtype=jnp.float32, remat: bool = False,
            conv_backend: str = "auto", conv_variant: str = "taps"):
    return DeepSupervisionUNet(num_classes=num_classes,
                               perturbation="feature_dropout", dtype=dtype,
                               remat=remat, conv_backend=conv_backend,
                               conv_variant=conv_variant)


@_register("unet_h")
def _unet_h(num_classes: int, dtype=jnp.float32, remat: bool = False,
            conv_backend: str = "auto", conv_variant: str = "taps"):
    return DeepSupervisionUNet(num_classes=num_classes,
                               perturbation="feature_noise", dtype=dtype,
                               remat=remat, conv_backend=conv_backend,
                               conv_variant=conv_variant)


def _register_basenets():
    """Stronger ResNet-backbone baselines — the reference keeps these as
    commented hooks (baseline/baseline_model.py:22-23, utilities/base.py)."""
    from uaps_tpu.models.resnet import BaseNet

    for bk in ("resnet18", "resnet34", "resnet50", "resnet101", "resnet152"):
        def make(num_classes, dtype=jnp.float32, remat=False, _bk=bk,
                 **kw):
            del remat, kw  # resnet trunk: no remat/pallas-conv knobs
            return BaseNet(backbone=_bk, num_classes=num_classes,
                           dtype=dtype)
        MODEL_REGISTRY[f"basenet_{bk}"] = make


_register_basenets()


def net_factory(net_type: str, in_chns: int = 3, class_num: int = 4,
                dtype=jnp.float32, **kwargs):
    """Build a model by name. `in_chns` is accepted for signature parity
    with the reference but unused: Flax infers input channels at init."""
    del in_chns
    if net_type not in MODEL_REGISTRY:
        raise ValueError(
            f"unknown net_type {net_type!r}; known: {sorted(MODEL_REGISTRY)}"
        )
    return MODEL_REGISTRY[net_type](class_num, dtype=dtype, **kwargs)
