"""Flax model zoo: the U-Net family of the reference, NHWC and fused.

One parameterized `MultiDecoderUNet` replaces the reference's five copies
(UNet, UNet_UAPS, UNet_CCT, UNet_UCC, UNet_CCPS); `DeepSupervisionUNet`
replaces UNet_f/g/h (Decoder_mcps). `net_factory` mirrors the reference
factories (utilities/UAPS_net_factory.py, utilities/m_net_factory.py,
per-method net_factory.py) under one registry.
"""
from uaps_tpu.models.unet import (
    ConvBlock,
    Encoder,
    Decoder,
    DeepSupervisionDecoder,
    DecoderDS,
    UNet,
    MultiDecoderUNet,
    DeepSupervisionUNet,
    UNET_FEATURES,
    UNET_DROPOUT,
)
from uaps_tpu.models.factory import net_factory, MODEL_REGISTRY

__all__ = [
    "ConvBlock", "Encoder", "Decoder", "DeepSupervisionDecoder",
    "DecoderDS",
    "UNet", "MultiDecoderUNet", "DeepSupervisionUNet",
    "net_factory", "MODEL_REGISTRY", "UNET_FEATURES", "UNET_DROPOUT",
]
