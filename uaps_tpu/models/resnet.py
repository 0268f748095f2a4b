"""ResNet backbone family + BaseNet multi-scale-flip TTA harness (Flax).

Pinned to /root/reference/utilities/resnet.py (BasicBlock:17-52,
Bottleneck:55-95, dilated ResNet:98-182, factories:193-213) and
/root/reference/utilities/base.py (BaseNet TTA:9-46). The reference uses
these as an optional stronger backbone (commented hooks in
baseline/baseline_model.py:22-23); resnet50/101/152 use the dilated-stage
variant (replace_stride_with_dilation=[False, True, True], output stride 8).

Init matches the reference: kaiming-normal(fan_out, relu) convs, unit BN
(resnet.py:133-138); `zero_init_residual` zeroes the last BN of each block.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

_kaiming = nn.initializers.variance_scaling(2.0, "fan_out",
                                            "truncated_normal")


def _bn(train: bool, dtype, zero_init: bool = False, name=None):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-5,
        dtype=dtype, name=name,
        scale_init=(nn.initializers.zeros if zero_init
                    else nn.initializers.ones))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    zero_init_residual: bool = False
    dtype: Dtype = jnp.float32
    expansion = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=self.dilation,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, kernel_init=_kaiming,
                      dtype=self.dtype, name="conv1")(x)
        out = _bn(train, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      kernel_init=_kaiming, dtype=self.dtype,
                      name="conv2")(out)
        out = _bn(train, self.dtype, zero_init=self.zero_init_residual,
                  name="bn2")(out)
        if self.has_downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=_kaiming,
                               dtype=self.dtype, name="down_conv")(x)
            identity = _bn(train, self.dtype, name="down_bn")(identity)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    zero_init_residual: bool = False
    dtype: Dtype = jnp.float32
    expansion = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False,
                      kernel_init=_kaiming, dtype=self.dtype,
                      name="conv1")(x)
        out = _bn(train, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), strides=self.stride,
                      padding=self.dilation,
                      kernel_dilation=(self.dilation, self.dilation),
                      use_bias=False, kernel_init=_kaiming,
                      dtype=self.dtype, name="conv2")(out)
        out = _bn(train, self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      kernel_init=_kaiming, dtype=self.dtype,
                      name="conv3")(out)
        out = _bn(train, self.dtype, zero_init=self.zero_init_residual,
                  name="bn3")(out)
        if self.has_downsample:
            identity = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                               use_bias=False, kernel_init=_kaiming,
                               dtype=self.dtype, name="down_conv")(x)
            identity = _bn(train, self.dtype, name="down_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Dilated-stage ResNet; base_forward returns (c1, c2, c3, c4)."""
    block: type = BasicBlock
    layers: Sequence[int] = (2, 2, 2, 2)
    replace_stride_with_dilation: Tuple[bool, bool, bool] = (
        False, False, False)
    zero_init_residual: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        exp = self.block.expansion
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=_kaiming, dtype=self.dtype, name="conv1")(x)
        x = _bn(train, self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = []
        inplanes = 64
        dilation = 1
        for stage, (planes, n_blocks) in enumerate(
                zip((64, 128, 256, 512), self.layers)):
            stride = 1 if stage == 0 else 2
            dilate = (stage > 0
                      and self.replace_stride_with_dilation[stage - 1])
            prev_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            for b in range(n_blocks):
                s = stride if b == 0 else 1
                d = prev_dilation if b == 0 else dilation
                needs_down = b == 0 and (
                    s != 1 or inplanes != planes * exp)
                x = self.block(
                    planes, stride=s, dilation=d, has_downsample=needs_down,
                    zero_init_residual=self.zero_init_residual,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{b}")(x, train=train)
                inplanes = planes * exp
            feats.append(x)
        return tuple(feats)  # c1, c2, c3, c4


def resnet18(dtype=jnp.float32, **kw):
    return ResNet(BasicBlock, (2, 2, 2, 2), dtype=dtype, **kw)


def resnet34(dtype=jnp.float32, **kw):
    return ResNet(BasicBlock, (3, 4, 6, 3), dtype=dtype, **kw)


def resnet50(dtype=jnp.float32, **kw):
    return ResNet(Bottleneck, (3, 4, 6, 3),
                  replace_stride_with_dilation=(False, True, True),
                  dtype=dtype, **kw)


def resnet101(dtype=jnp.float32, **kw):
    return ResNet(Bottleneck, (3, 4, 23, 3),
                  replace_stride_with_dilation=(False, True, True),
                  dtype=dtype, **kw)


def resnet152(dtype=jnp.float32, **kw):
    return ResNet(Bottleneck, (3, 8, 36, 3),
                  replace_stride_with_dilation=(False, True, True),
                  dtype=dtype, **kw)


BACKBONES = {"resnet18": resnet18, "resnet34": resnet34,
             "resnet50": resnet50, "resnet101": resnet101,
             "resnet152": resnet152}


def resize_align_corners(x: jax.Array, out_hw: Tuple[int, int]) -> jax.Array:
    """Arbitrary-size bilinear resize with torch align_corners=True
    semantics, as two dense interpolation matmuls (MXU-friendly; shapes are
    static so the matrices are compile-time constants)."""
    from uaps_tpu.models.unet import _align_corners_weights
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    wh = _align_corners_weights(h, oh).astype(x.dtype)
    ww = _align_corners_weights(w, ow).astype(x.dtype)
    # see upsample2x_align_corners: HIGHEST only for fp32 parity
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    x = jnp.einsum("Hh,bhwc->bHwc", wh, x, precision=prec)
    return jnp.einsum("Ww,bHwc->bHWc", ww, x, precision=prec)


class FCNHead(nn.Module):
    """Concrete segmentation head for BaseNet (the reference's self.head is
    left to subclasses, base.py:19 — this is the standard FCN choice)."""
    num_classes: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = nn.Conv(c // 4, (3, 3), padding=1, use_bias=False,
                    kernel_init=_kaiming, dtype=self.dtype)(x)
        x = _bn(train, self.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), dtype=jnp.float32)(x)


class BaseNet(nn.Module):
    """ResNet backbone + head with multi-scale flip TTA (base.py:9-46).

    forward(x):            head(backbone(x)) upsampled to input size
    forward(x, tta=True):  sum of softmax predictions over scales
                           [0.5, 0.75, 1.0, 1.5, 2.0], each plus its
                           horizontal flip (all branches trace into one
                           jitted program — static scale list).
    """
    backbone: str = "resnet50"
    num_classes: int = 4
    dtype: Dtype = jnp.float32

    def setup(self):
        self.net = BACKBONES[self.backbone](dtype=self.dtype)
        self.head = FCNHead(self.num_classes, dtype=self.dtype)

    def base_forward(self, x, train: bool = False):
        h, w = x.shape[1:3]
        c4 = self.net(x, train=train)[-1]
        out = self.head(c4, train=train)
        return resize_align_corners(out, (h, w))

    def __call__(self, x, train: bool = False, tta: bool = False):
        if not tta:
            return self.base_forward(x, train=train)
        h, w = x.shape[1:3]
        total = None
        for scale in (0.5, 0.75, 1.0, 1.5, 2.0):
            ch, cw = int(h * scale), int(w * scale)
            cur = resize_align_corners(x, (ch, cw))
            out = jax.nn.softmax(self.base_forward(cur, train=train), -1)
            out = resize_align_corners(out, (h, w))
            total = out if total is None else total + out
            flipped = jax.nn.softmax(
                self.base_forward(cur[:, :, ::-1], train=train), -1)
            out = resize_align_corners(flipped[:, :, ::-1], (h, w))
            total = total + out
        return total
