"""U-Net building blocks and the multi-decoder family, in Flax (NHWC).

Architecture pinned to /root/reference/utilities/UAPS_unet.py (blocks:31-153,
UNet:188-205, UNet_UAPS:208-233), /root/reference/utilities/m_unet.py
(Decoder_mcps:156-210, UNet_f/g/h:264-329, UNet_CCPS:332-357),
/root/reference/UCC/UCC_unet.py (UNet_UCC:245-270) and
/root/reference/CCT/CCT_unet.py (UNet_CCT:261-286).

TPU-first deviations (documented, behavior-preserving for training quality):
  - NHWC layout (XLA's preferred conv layout on TPU) instead of NCHW.
  - One fused forward: encoder runs once, all decoders trace into a single
    XLA program; the reference re-instantiates perturbation modules per call.
  - Perturbation RNG comes from a single `perturb` rng collection instead of
    three frameworks' RNGs.
  - `compute_dtype` enables bfloat16 activations/weights-on-the-fly for the
    MXU; parameters stay float32.
  - BatchNorm under `jit`-sharded data parallelism reduces over the GLOBAL
    batch (sync-BN). The reference's nn.DataParallel uses per-replica stats;
    sync-BN is strictly more deterministic and is the standard TPU choice
    (SURVEY.md §7 hard part 2).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from uaps_tpu.ops.perturbations import perturb_features

# Reference channel/dropout schedule (UAPS_unet.py:192-197)
UNET_FEATURES: Tuple[int, ...] = (16, 32, 64, 128, 256)
UNET_DROPOUT: Tuple[float, ...] = (0.05, 0.1, 0.2, 0.3, 0.5)

Dtype = Any

def to_nchw(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 3, 1, 2))


def to_nhwc(x: jax.Array) -> jax.Array:
    return jnp.transpose(x, (0, 2, 3, 1))


class Conv3x3(nn.Module):
    """3x3 SAME conv, param-compatible with nn.Conv, that dispatches to
    the Pallas channels-in-sublanes kernel (pallas/conv3x3_nchw.py) on TPU
    for the shapes where it beats XLA (high spatial resolution, small
    output channel count — measured 3.1x at 256x256/16ch); falls back to
    lax.conv elsewhere. The parameter tree ('kernel' HWIO + 'bias') is
    identical to nn.Conv so checkpoints and the torch importer are
    unaffected. layout='nchw' runs without any boundary transposes
    (profiling showed the NHWC wrapper's layout copies cost ~21 ms/step —
    PERF.md)."""
    features: int
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"
    out_dtype: Any = None  # e.g. f32 logits from bf16 compute (NCHW only)
    # kernel dispatch config (ModelConfig.conv_backend/conv_variant,
    # threaded through module attributes — no module globals, so models
    # with different settings coexist in one process):
    backend: str = "auto"   # "auto" = pallas-on-TPU where gated; "xla"
    variant: str = "taps"   # taps|im2col|dhdw|fullh (PERF.md ablations)

    @nn.compact
    def __call__(self, x, return_stats: bool = False, *,
                 apply_bias: bool = True, bnl=None, hw=None):
        """return_stats=True (NCHW only) additionally returns the
        per-channel f32 (sum, sumsq, n) of the BIASED output over
        (B, H, W), computed for free in the kernel's accumulator —
        StatsBatchNorm consumes them instead of re-reducing the tensor.

        apply_bias=False returns (raw_conv_out, bias_param) so the
        caller can fold the bias into a following BatchNorm
        algebraically (the fused ConvBlock path).
        bnl=(factor, shift) applies the previous BN's normalize + leaky
        in the conv kernel's VMEM prologue (pallas/conv_bnl.py) — the
        normalized tensor never round-trips HBM.

        FLAT mode (r5): a 3-D x [B, C, H*W] with hw=(H, W) keeps the
        kernels' native flat lane view in AND out (ConvBlock flat
        island — the 4-D<->flat boundary reshapes are relayouts); the
        non-pallas fallback reshapes to 4-D around lax.conv."""
        nchw = self.layout == "nchw"
        flat = x.ndim == 3
        if flat:
            assert nchw and hw is not None and bnl is None \
                and not return_stats
            h, w = hw
        cin = x.shape[1] if nchw else x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        x = x.astype(self.dtype)
        if not flat:
            h, w = x.shape[2:4] if nchw else x.shape[1:3]
        use_pallas = (
            self.backend != "xla"
            and jax.devices()[0].platform == "tpu"
            and h >= 128 and w >= 128 and h % 8 == 0 and w % 128 == 0
            and self.features <= 32 and cin <= 64
        )
        if bnl is not None:
            assert nchw and not return_stats
            from uaps_tpu.pallas.conv_bnl import (conv3x3_bnl,
                                                  conv3x3_bnl_reference)
            fn = conv3x3_bnl if use_pallas else conv3x3_bnl_reference
            y = fn(x, bnl[0], bnl[1], kernel, self.out_dtype)
            out = y  # bias applied by caller / folded downstream
            if not apply_bias:
                return out, bias
            return out + bias.astype(out.dtype)[None, :, None, None]
        if flat:
            if use_pallas:
                from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast_flat
                y = conv3x3_fast_flat(x, kernel, (h, w), False,
                                      self.out_dtype)
            else:
                b = x.shape[0]
                dt = self.out_dtype or x.dtype
                x4 = x.reshape(b, cin, h, w).astype(dt)
                y = jax.lax.conv_general_dilated(
                    x4, kernel.astype(dt), (1, 1), "SAME",
                    dimension_numbers=("NCHW", "HWIO", "NCHW"))
                y = y.reshape(b, self.features, h * w)
            if not apply_bias:
                return y, bias
            return y + bias.astype(y.dtype)[None, :, None]
        stats = None
        if use_pallas:
            variant = self.variant
            if nchw and return_stats and variant == "taps":
                from uaps_tpu.pallas.conv3x3_nchw import \
                    conv3x3_fast_nchw_stats
                y, s1, s2 = conv3x3_fast_nchw_stats(x, kernel)
                stats = (s1, s2)
            elif nchw:
                from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast_nchw
                y = conv3x3_fast_nchw(x, kernel, False, variant,
                                      self.out_dtype)
            else:
                from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast
                y = conv3x3_fast(x, kernel, False, variant)
        else:
            dn = (("NCHW", "HWIO", "NCHW") if nchw
                  else ("NHWC", "HWIO", "NHWC"))
            if self.out_dtype is not None and self.out_dtype != x.dtype:
                # preferred_element_type breaks conv autodiff with mixed
                # dtypes; just run the fallback conv in the wider dtype
                # (only small / low-res shapes land here)
                x = x.astype(self.out_dtype)
                kernel = kernel.astype(self.out_dtype)
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), "SAME", dimension_numbers=dn)
        if not apply_bias:
            assert not return_stats
            return y, bias
        b = bias.astype(y.dtype)
        out = y + (b[None, :, None, None] if nchw else b)
        if not return_stats:
            return out
        assert nchw, "return_stats supports NCHW only"
        n = x.shape[0] * h * w
        if stats is None:
            yf = y.astype(jnp.float32)
            stats = (yf.sum(axis=(0, 2, 3)), (yf * yf).sum(axis=(0, 2, 3)))
        # fold the bias into the moments (per-channel scalar algebra):
        # sum(y+b) = s1 + n b ; sum((y+b)^2) = s2 + 2 b s1 + n b^2
        s1, s2 = stats
        bf = bias.astype(jnp.float32)
        s1b = s1 + n * bf
        s2b = s2 + 2.0 * bf * s1 + n * bf * bf
        return out, s1b, s2b, n


class StatsBatchNorm(nn.Module):
    """BatchNorm over an NCHW tensor whose batch moments arrive
    precomputed (from the conv kernel's f32 accumulator). Param tree and
    batch_stats collection are IDENTICAL to nn.BatchNorm (scale/bias +
    mean/var), and the math mirrors flax _compute_stats: f32, fast
    variance E[x^2]-E[x]^2, negative variance clipped to 0."""
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, s1, s2, n, *, train: bool = False):
        c = x.shape[1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            mean = s1 / n
            var = jnp.maximum(s2 / n - mean * mean, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        factor = (jax.lax.rsqrt(var + self.epsilon) * scale).astype(
            self.dtype)[None, :, None, None]
        shift = (bias - mean * jax.lax.rsqrt(var + self.epsilon) * scale
                 ).astype(self.dtype)[None, :, None, None]
        return x.astype(self.dtype) * factor + shift


class BNFactorShift(nn.Module):
    """BatchNorm folded to per-channel (factor, shift_eff) for the fused
    conv path. Param/variable tree IDENTICAL to nn.BatchNorm (scale/bias
    params + batch_stats mean/var). Consumes the RAW conv output's
    moments (sum, sumsq over B,H,W) plus the conv bias b, so the
    normalize can run inside the next conv's VMEM prologue:

        BN(y + b) == y * factor + shift_eff

    Running stats store moments of (y + b), matching the unfused path
    (bias shifts the mean, leaves the variance)."""
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, s1, s2, n, conv_bias, *, train: bool = False):
        c = s1.shape[0]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        b = conv_bias.astype(jnp.float32)
        if train:
            mean_raw = s1 / n
            var = jnp.maximum(s2 / n - mean_raw * mean_raw, 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * (mean_raw + b)
                ra_var.value = m * ra_var.value + (1 - m) * var
            factor = jax.lax.rsqrt(var + self.epsilon) * scale
            # (y+b)*factor + (bias - (mean_raw+b)*factor): b cancels
            shift_eff = bias - mean_raw * factor
        else:
            factor = jax.lax.rsqrt(ra_var.value + self.epsilon) * scale
            shift_eff = bias - (ra_mean.value - b) * factor
        return factor, shift_eff


class _ConvParams(nn.Module):
    """Declares a Conv3x3-compatible {kernel, bias} param pair without
    running a conv — the chain path (pallas/block_conv.py) consumes the
    raw params so the whole ConvBlock can run as two fused kernels while
    keeping the checkpoint/torch-import tree identical."""
    features: int

    @nn.compact
    def __call__(self, cin: int):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return kernel, bias


class ConvBlock(nn.Module):
    """Conv3x3-BN-LeakyReLU, Dropout, Conv3x3-BN-LeakyReLU
    (UAPS_unet.py:31-47). layout picks the activation layout; BN params
    and batch_stats stay (C,) either way. bn_stats=True sources the BN
    moments from the conv kernel's accumulator (StatsBatchNorm) — kept as
    an ablation: it removes the ~10 ms/step of convert_reduce fusions but
    the in-kernel moment pass + the analytic-VJP dy folding cost MORE
    (measured 113.3 vs 107.6 ms/step), so the default stays off.

    Fused path (NCHW, dropout_rate 0, conv_backend 'fused', TPU): the
    middle BN-normalize + LeakyReLU runs inside the second conv's VMEM
    prologue (pallas/conv_bnl.py) — the normalized tensor never
    round-trips HBM, and the backward's mask/factor multiplies fuse into
    the dgrad/wgrad kernels. Param tree unchanged. MEASURED SLOWER than
    the default plain-conv path (101.3 vs 98.0 ms/step faithful UAPS
    bf16 bs16, r2 A/B + profile: the bnl kernels cost +4.5 ms of
    prologue/mask/df-ds work while XLA was already fusing the
    normalize+leaky into neighboring ops), so it is OPT-IN via
    conv_backend='fused'; kept for the exact-zero conv-bias grads and as
    the base for future fusion work."""
    features: int
    dropout_rate: float = 0.0
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"
    bn_stats: bool = False
    conv_backend: str = "auto"
    conv_variant: str = "taps"
    # auto (fused pallas kernel on TPU, nn.Dropout elsewhere) | xla |
    # pallas; the fused kernel measured 98.7 -> 94.6 ms/step (PERF.md r2)
    dropout_backend: str = "auto"
    # BN batch-statistics layout (NCHW only):
    #   auto/4d  nn.BatchNorm reduces the 4-D tensor
    #   flat     reduce the conv's flat [B, C, H*W] view instead — the
    #            r2c profile measured the same 256px reduction at
    #            0.10 ms flat vs 0.51 ms on the 4-D-reshaped tensor
    #            (the flat view is the conv kernel's raw output layout)
    bn_backend: str = "auto"
    force_bnl: bool = False   # tests: take the fused path on CPU
    force_flat: bool = False  # tests: take the flat island on CPU

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        nchw = self.layout == "nchw"
        use_fused = (
            nchw and not self.bn_stats and self.dropout_rate == 0.0
            and (self.conv_backend == "fused" or self.force_bnl)
        )
        if use_fused:
            return self._fused(x, train)
        if nchw and not self.bn_stats and self.conv_backend == "chain":
            return self._chain(x, train)
        if nchw and not self.bn_stats and self._flat_ok(x):
            return self._flat(x, train)

        def conv_bn(x, conv_name, bn_name):
            if nchw and self.bn_stats:
                y, s1, s2, n = Conv3x3(self.features, self.dtype, "nchw",
                                       backend=self.conv_backend,
                                       variant=self.conv_variant,
                                       name=conv_name)(x, True)
                return StatsBatchNorm(momentum=0.9, epsilon=1e-5,
                                      dtype=self.dtype, name=bn_name)(
                    y, s1, s2, n, train=train)
            y = Conv3x3(self.features, self.dtype, self.layout,
                        backend=self.conv_backend,
                        variant=self.conv_variant,
                        name=conv_name)(x)
            if nchw and self.bn_backend == "flat":
                b, c, h, w = y.shape
                yf = y.reshape(b, c, h * w).astype(jnp.float32)
                return StatsBatchNorm(momentum=0.9, epsilon=1e-5,
                                      dtype=self.dtype, name=bn_name)(
                    y, yf.sum(axis=(0, 2)), (yf * yf).sum(axis=(0, 2)),
                    b * h * w, train=train)
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, axis=1 if nchw else -1, name=bn_name)(y)

        x = conv_bn(x, "Conv_0", "BatchNorm_0")
        x = nn.leaky_relu(x)  # negative_slope 0.01 == torch default
        if self.dropout_rate > 0:
            # auto additionally requires conv_backend != "xla": the
            # trainer forces conv_backend="xla" in GSPMD multi-device
            # mode precisely to keep pallas_call out of the jitted step
            # (pallas_call runs replicated under GSPMD), and the dropout
            # kernel must follow the same routing
            use_pallas_drop = self.dropout_backend == "pallas" or (
                self.dropout_backend == "auto"
                and self.conv_backend != "xla"
                and jax.devices()[0].platform == "tpu")
            if use_pallas_drop:
                # fused on-core-PRNG dropout (pallas/perturb.py): the
                # mask is regenerated in the VJP, so neither the mask
                # nor the threefry bits tensor is ever materialized
                if train:
                    from uaps_tpu.ops.perturbations import _kernel_seed
                    from uaps_tpu.pallas.perturb import fused_dropout
                    seed = _kernel_seed(self.make_rng("dropout"))
                    x = fused_dropout(x, seed, self.dropout_rate)
            else:
                x = nn.Dropout(self.dropout_rate,
                               deterministic=not train)(x)
        x = conv_bn(x, "Conv_1", "BatchNorm_1")
        return nn.leaky_relu(x)

    def _flat_ok(self, x) -> bool:
        """Flat-island gate (r5): the whole block runs on the conv
        kernels' native flat [B, C, H*W] lane view — the 4-D<->flat
        boundary reshapes are genuine relayouts (H moves between
        sublanes and lanes; 7.17 ms/step in the r5a profile), so they
        are paid once per block instead of around every conv call.
        Requires the dwmf kernels (auto backend) and the shapes their
        pallas gate accepts. UAPS_FLAT_BLOCKS=0 restores the 4-D path
        for step A/Bs; force_flat exercises the island on CPU (convs
        route to the exact lax.conv fallback there)."""
        import os
        if self.conv_variant != "dwmf" or self.conv_backend != "auto":
            return False
        if self.bn_backend == "flat":
            return False  # flat BN is inherent to the island
        if os.environ.get("UAPS_FLAT_BLOCKS", "1") == "0":
            return False
        if not (self.force_flat or jax.devices()[0].platform == "tpu"):
            return False
        b, c, h, w = x.shape
        return (h >= 128 and w >= 128 and h % 8 == 0 and w % 128 == 0
                and self.features <= 32 and c <= 64)

    def _flat(self, x, train: bool):
        """The default NCHW ConvBlock recipe (UAPS_unet.py:31-47) on the
        flat lane view: conv1 -> BN -> leaky -> dropout -> conv2 -> BN
        -> leaky, all on [B, C, H*W] (BN(axis=1) reduces the flat view
        directly — the layout the conv kernel wrote). Identical param
        tree to the 4-D path."""
        b, c, hh, ww = x.shape
        xf = x.reshape(b, c, hh * ww)

        def conv_bn(xf, conv_name, bn_name):
            y = Conv3x3(self.features, self.dtype, "nchw",
                        backend=self.conv_backend,
                        variant=self.conv_variant,
                        name=conv_name)(xf, hw=(hh, ww))
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=self.dtype, axis=1, name=bn_name)(y)

        xf = nn.leaky_relu(conv_bn(xf, "Conv_0", "BatchNorm_0"))
        if self.dropout_rate > 0:
            use_pallas_drop = self.dropout_backend == "pallas" or (
                self.dropout_backend == "auto"
                and jax.devices()[0].platform == "tpu")
            if use_pallas_drop:
                if train:
                    from uaps_tpu.ops.perturbations import _kernel_seed
                    from uaps_tpu.pallas.perturb import fused_dropout
                    seed = _kernel_seed(self.make_rng("dropout"))
                    xf = fused_dropout(xf, seed, self.dropout_rate)
            else:
                xf = nn.Dropout(self.dropout_rate,
                                deterministic=not train)(xf)
        xf = nn.leaky_relu(conv_bn(xf, "Conv_1", "BatchNorm_1"))
        return xf.reshape(b, self.features, hh, ww)

    def _chain(self, x, train: bool):
        """The r4 fused ConvBlock chain (pallas/block_conv.py): conv
        kernels emit the BN moments free from their f32 accumulators,
        the middle BN-normalize+LeakyReLU+Dropout runs inside conv2's
        VMEM prologue (position-hashed mask, regenerated in the VJP),
        and each backward is one fused dgrad+wgrad kernel. Param tree
        identical to the default path (Conv_0/1 + BatchNorm_0/1).

        Matches reference UAPS_unet.py:31-47 semantics; RNG deviation
        (hash bitstream vs torch RNG) documented in ARCHITECTURE.md."""
        from uaps_tpu.pallas import block_conv as bc
        cin = x.shape[1]
        n = x.shape[0] * x.shape[2] * x.shape[3]
        use_k = (
            jax.devices()[0].platform == "tpu"
            and x.shape[2] >= 128 and x.shape[3] >= 128
            and x.shape[2] % 8 == 0 and x.shape[3] % 128 == 0
            and self.features <= 32 and cin <= 64
        )
        dt = self.dtype
        k1, b1 = _ConvParams(self.features, name="Conv_0")(cin)
        k2, b2 = _ConvParams(self.features, name="Conv_1")(self.features)
        xc = x.astype(dt)
        fn1 = bc.chain_conv_plain if use_k else bc.chain_ref_plain
        y1, s1a, s2a = fn1(xc, k1.astype(dt))
        f1, sh1 = BNFactorShift(name="BatchNorm_0")(
            s1a, s2a, n, b1, train=train)
        rate = float(self.dropout_rate) if train else 0.0
        if rate > 0:
            from uaps_tpu.ops.perturbations import _kernel_seed
            seed = _kernel_seed(self.make_rng("dropout"))
        else:
            seed = jnp.int32(0)
        fn2 = bc.chain_conv_bnl if use_k else bc.chain_ref_bnl
        y2, s1b, s2b = fn2(y1, f1, sh1, k2.astype(dt), seed, rate)
        f2, sh2 = BNFactorShift(name="BatchNorm_1")(
            s1b, s2b, n, b2, train=train)
        out = (y2 * f2.astype(dt)[None, :, None, None]
               + sh2.astype(dt)[None, :, None, None])
        return nn.leaky_relu(out)

    def _fused(self, x, train: bool):
        """conv1 -> (moments) -> [normalize+leaky fused into conv2's
        prologue] -> (moments) -> normalize+leaky. Numerics: the fused
        prologue computes the normalize in f32 (the unfused bf16 path
        casts factor/shift to bf16 first) — same math, >= precision."""
        conv_kw = dict(dtype=self.dtype, layout="nchw",
                       backend=self.conv_backend,
                       variant=self.conv_variant)
        y1, b1 = Conv3x3(self.features, name="Conv_0",
                         **conv_kw)(x, apply_bias=False)
        n = y1.shape[0] * y1.shape[2] * y1.shape[3]
        y1f = y1.astype(jnp.float32)
        f1, s1 = BNFactorShift(name="BatchNorm_0")(
            y1f.sum(axis=(0, 2, 3)), (y1f * y1f).sum(axis=(0, 2, 3)),
            n, b1, train=train)
        y2, b2 = Conv3x3(self.features, name="Conv_1",
                         **conv_kw)(y1, apply_bias=False, bnl=(f1, s1))
        y2f = y2.astype(jnp.float32)
        f2, s2 = BNFactorShift(name="BatchNorm_1")(
            y2f.sum(axis=(0, 2, 3)), (y2f * y2f).sum(axis=(0, 2, 3)),
            n, b2, train=train)
        out = (y2 * f2.astype(self.dtype)[None, :, None, None]
               + s2.astype(self.dtype)[None, :, None, None])
        return nn.leaky_relu(out)


def max_pool_2x2(x: jax.Array, layout: str,
                 backend: str = "auto",
                 pool_backend: str = "auto") -> jax.Array:
    """2x2/stride-2 max pool. `backend` is the conv_backend (its "xla"
    value marks the GSPMD multi-device mode where pallas_call must stay
    out of the jitted step); `pool_backend` picks the pool impl:
      auto     NCHW Pallas fwd+bwd kernel on TPU where the shape gate
               admits it (DEFAULT since the r4a A/B: 89.9 -> 85.6
               ms/step faithful UAPS); XLA reduce_window elsewhere
      pallas   NCHW Pallas fwd+bwd kernel (pallas/pool_nchw.py) — kills
               the 256px select-and-scatter {1,0,3,2} transpose chain
               (~3.8 ms/step in the r2c profile)
      maskpool XLA fwd + fused elementwise mask backward (neutral A/B)
      xla      plain reduce_window"""
    if layout == "nchw":
        h, w = x.shape[2:4]
        if pool_backend in ("auto", "pallas") and backend != "xla":
            from uaps_tpu.pallas.pool_nchw import (max_pool_2x2_nchw,
                                                   pool_pallas_ok)
            if pool_pallas_ok(x) and jax.devices()[0].platform == "tpu":
                return max_pool_2x2_nchw(x)
        if pool_backend == "maskpool" and h % 2 == 0 and w % 2 == 0:
            # select-and-scatter-free backward (pallas/maxpool.py):
            # same fwd, same tie semantics, backward as fused
            # elementwise mask ops. Step A/B measured it perf-NEUTRAL
            # (98.6 vs 97.9 ms/step faithful UAPS — the mask ops cost
            # what select-and-scatter cost), so it is opt-in only.
            from uaps_tpu.pallas.maxpool import max_pool_2x2_fast
            return max_pool_2x2_fast(x)
        # init must be the scalar literal -inf for jax to recognize the
        # max-pool monoid (an array init kills the reverse-mode rule)
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max,
            (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class DownBlock(nn.Module):
    """2x2 max-pool then ConvBlock (UAPS_unet.py:50-62).

    in_layout is the incoming feature layout; the pool runs there, then
    converts to `layout` (transposing AFTER the pool moves 4x fewer
    bytes) before the ConvBlock."""
    features: int
    dropout_rate: float
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"
    in_layout: str = "nhwc"
    conv_backend: str = "auto"
    conv_variant: str = "taps"
    dropout_backend: str = "auto"
    pool_backend: str = "auto"
    bn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        x = max_pool_2x2(x, self.in_layout, self.conv_backend,
                         self.pool_backend)
        if self.in_layout != self.layout:
            x = to_nhwc(x) if self.layout == "nhwc" else to_nchw(x)
        return ConvBlock(self.features, self.dropout_rate, self.dtype,
                         self.layout, conv_backend=self.conv_backend,
                         conv_variant=self.conv_variant,
                         dropout_backend=self.dropout_backend,
                         bn_backend=self.bn_backend,
                         )(x, train=train)


def _align_corners_weights(n_in: int, n_out: int) -> jnp.ndarray:
    """[n_out, n_in] linear-interp matrix with torch align_corners=True
    semantics (output i samples input i*(n_in-1)/(n_out-1))."""
    import numpy as np
    if n_in == 1:
        return jnp.ones((n_out, 1), jnp.float32)
    pos = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(pos).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (pos - lo).astype(np.float32)
    w = np.zeros((n_out, n_in), np.float32)
    w[np.arange(n_out), lo] += 1.0 - frac
    w[np.arange(n_out), hi] += frac
    return jnp.asarray(w)


def upsample2x_align_corners(x: jax.Array,
                             layout: str = "nhwc") -> jax.Array:
    """2x bilinear upsample matching torch nn.Upsample(align_corners=True).

    Implemented as two dense interpolation matmuls (static shapes, so the
    weight matrices are compile-time constants and the contraction maps to
    the MXU) instead of gather-based resize.
    """
    h, w = x.shape[2:4] if layout == "nchw" else x.shape[1:3]
    wh = _align_corners_weights(h, 2 * h).astype(x.dtype)
    ww = _align_corners_weights(w, 2 * w).astype(x.dtype)
    # fp32: HIGHEST precision (default matmul precision truncates the
    # interp weights to bf16 mantissas, breaking parity with torch
    # align_corners). bf16 compute: default precision — HIGHEST would run
    # the 6-pass fp32 MXU emulation and dominates the backward pass
    # (measured 104ms vs 31ms for the 4-decoder grad).
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32 else None)
    if layout == "nchw":
        x = jnp.einsum("Hh,bchw->bcHw", wh, x, precision=prec)
        return jnp.einsum("Ww,bcHw->bcHW", ww, x, precision=prec)
    x = jnp.einsum("Hh,bhwc->bHwc", wh, x, precision=prec)
    return jnp.einsum("Ww,bHwc->bHWc", ww, x, precision=prec)


class PointwiseConv(nn.Module):
    """1x1 conv with nn.Conv-compatible params ('kernel' [1,1,Cin,Cout] +
    'bias'), usable in either layout (einsum for NCHW)."""
    features: int
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"

    @nn.compact
    def __call__(self, x):
        nchw = self.layout == "nchw"
        cin = x.shape[1] if nchw else x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        k = kernel[0, 0].astype(self.dtype)
        x = x.astype(self.dtype)
        if nchw:
            y = jnp.einsum("bchw,cd->bdhw", x, k)
            return y + bias.astype(y.dtype)[None, :, None, None]
        y = jnp.einsum("bhwc,cd->bhwd", x, k)
        return y + bias.astype(y.dtype)


class UpBlock(nn.Module):
    """Upsample, concat skip, ConvBlock (UAPS_unet.py:65-86).

    REFERENCE TRAP: the reference's Decoder builds UpBlock without passing
    `bilinear`, whose default is True (UAPS_unet.py:68-79,129-136) — the
    params dict's 'bilinear': False is dead config. So the actual trained
    architecture is conv1x1 + bilinear(align_corners=True) upsampling, and
    that is our default; bilinear=False gives the transposed-conv variant.
    """
    skip_features: int
    out_features: int
    dropout_rate: float = 0.0
    bilinear: bool = True
    dtype: Dtype = jnp.float32
    layout: str = "nhwc"     # layout of skip + this block's ConvBlock
    x_layout: str = "nhwc"   # layout of the incoming coarse feature
    conv_backend: str = "auto"
    conv_variant: str = "taps"
    bn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, skip, *, train: bool = False):
        if self.x_layout != self.layout:
            # convert at the COARSE resolution (4x fewer bytes than after
            # upsampling)
            x = to_nchw(x) if self.layout == "nchw" else to_nhwc(x)
        if self.bilinear:
            x = PointwiseConv(self.skip_features, self.dtype, self.layout,
                              name="Conv_0")(x)
            x = upsample2x_align_corners(x, self.layout)
        else:
            assert self.layout == "nhwc", \
                "transposed-conv UpBlock supports NHWC only"
            x = nn.ConvTranspose(
                self.skip_features, (2, 2), strides=(2, 2), dtype=self.dtype
            )(x)
        # reference concatenates [skip, upsampled] (torch.cat([x2, x1]))
        ch_axis = 1 if self.layout == "nchw" else -1
        x = jnp.concatenate([skip, x], axis=ch_axis)
        return ConvBlock(self.out_features, self.dropout_rate, self.dtype,
                         self.layout, conv_backend=self.conv_backend,
                         conv_variant=self.conv_variant,
                         bn_backend=self.bn_backend)(x, train=train)


def _level_layout(level: int, nchw_levels: int) -> str:
    return "nchw" if level < nchw_levels else "nhwc"


class Encoder(nn.Module):
    """5-stage encoder, returns all skip features (UAPS_unet.py:89-116).

    nchw_levels > 0 runs the first N resolution levels (level 0 = input
    resolution) with NCHW activations so the Pallas conv kernels need no
    boundary transposes; returned skip features are NCHW for those levels
    and NHWC for the rest (Decoder consumes them accordingly)."""
    in_features: Tuple[int, ...] = UNET_FEATURES
    dropout: Tuple[float, ...] = UNET_DROPOUT
    dtype: Dtype = jnp.float32
    nchw_levels: int = 0
    conv_backend: str = "auto"
    conv_variant: str = "taps"
    dropout_backend: str = "auto"
    pool_backend: str = "auto"
    bn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # `train` is positional so nn.remat can declare it static
        ft, dp = self.in_features, self.dropout
        lay = [_level_layout(i, self.nchw_levels) for i in range(5)]
        if lay[0] == "nchw":
            x = to_nchw(x)
        feats = [ConvBlock(ft[0], dp[0], self.dtype, lay[0],
                           conv_backend=self.conv_backend,
                           conv_variant=self.conv_variant,
                           dropout_backend=self.dropout_backend,
                           bn_backend=self.bn_backend,
                           name="in_conv")(x, train=train)]
        for i in range(1, 5):
            feats.append(DownBlock(
                ft[i], dp[i], self.dtype, lay[i], lay[i - 1],
                conv_backend=self.conv_backend,
                conv_variant=self.conv_variant,
                dropout_backend=self.dropout_backend,
                pool_backend=self.pool_backend,
                bn_backend=self.bn_backend,
                name=f"down{i}")(feats[-1], train=train))
        return feats


class Decoder(nn.Module):
    """4 up-stages + 3x3 output conv -> logits (UAPS_unet.py:119-153).

    nchw_levels mirrors the Encoder: up-stages producing levels below it
    run NCHW (skips arrive NCHW from the Encoder), and the logits are
    transposed back so the returned layout is always NHWC."""
    num_classes: int
    features: Tuple[int, ...] = UNET_FEATURES
    bilinear: bool = True  # see UpBlock docstring: reference default-arg trap
    dtype: Dtype = jnp.float32
    nchw_levels: int = 0
    conv_backend: str = "auto"
    conv_variant: str = "taps"
    head_variant: str = "taps"   # out_conv: taps|im2col|dhdw|xla
    bn_backend: str = "auto"

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], train: bool = False,
                 return_feat: bool = False):
        ft = self.features
        x0, x1, x2, x3, x4 = feats
        lay = [_level_layout(i, self.nchw_levels) for i in range(5)]
        x = x4
        skips = [x3, x2, x1, x0]
        for j, skip in enumerate(skips):
            out_level = 3 - j
            x = UpBlock(ft[out_level], ft[out_level], 0.0, self.bilinear,
                        self.dtype, lay[out_level], lay[out_level + 1],
                        conv_backend=self.conv_backend,
                        conv_variant=self.conv_variant,
                        bn_backend=self.bn_backend,
                        name=f"up{j + 1}")(x, skip, train=train)
        if return_feat:
            # packed-head path (MultiDecoderUNet): declare this decoder's
            # out_conv params (tree unchanged) but let the caller run the
            # heads of ALL decoders as one block-diagonal conv
            cin = x.shape[1] if lay[0] == "nchw" else x.shape[-1]
            kernel, bias = _ConvParams(self.num_classes,
                                       name="out_conv")(cin)
            return x, kernel, bias
        if lay[0] == "nchw":
            if self.head_variant == "xla":
                # param tree identical to the pallas head (HWIO kernel +
                # bias under 'out_conv'); logits come out NHWC directly
                return nn.Conv(self.num_classes, (3, 3), padding=1,
                               dtype=jnp.float32,
                               name="out_conv")(to_nhwc(x))
            # bf16 inputs/weights, f32 logits straight from the kernel's
            # f32 accumulator (f32-in out_conv profiled 2x slower)
            logits = Conv3x3(self.num_classes, self.dtype, "nchw",
                             out_dtype=jnp.float32,
                             backend=self.conv_backend,
                             variant=self.head_variant, name="out_conv")(x)
            return to_nhwc(logits)
        logits = nn.Conv(
            self.num_classes, (3, 3), padding=1, dtype=jnp.float32,
            name="out_conv",
        )(x)
        return logits


class DeepSupervisionDecoder(nn.Module):
    """Decoder_mcps (m_unet.py:156-210): multi-scale heads + feature taps.

    Returns a dict:
      bottleneck, f1..f4 (intermediate up-stage features),
      dp0 (full-res logits), dp1..dp3 (coarser heads, nearest-resized to
      the input shape, matching torch F.interpolate default mode).
    """
    num_classes: int
    features: Tuple[int, ...] = UNET_FEATURES
    bilinear: bool = True  # see UpBlock docstring: reference default-arg trap
    dtype: Dtype = jnp.float32
    conv_backend: str = "auto"
    conv_variant: str = "taps"

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array], out_hw: Tuple[int, int],
                 train: bool = False):
        ft = self.features
        x0, x1, x2, x3, x4 = feats
        h, w = out_hw

        def head(x, name):
            logits = nn.Conv(self.num_classes, (3, 3), padding=1,
                             dtype=jnp.float32, name=name)(x)
            b = logits.shape[0]
            return jax.image.resize(
                logits, (b, h, w, self.num_classes), method="nearest"
            )

        def up(j):
            # up1 -> ft[3] ... up4 -> ft[0] (m_unet.py:168-175)
            return UpBlock(ft[4 - j], ft[4 - j], 0.0, self.bilinear,
                           self.dtype, conv_backend=self.conv_backend,
                           conv_variant=self.conv_variant, name=f"up{j}")

        f1 = up(1)(x4, x3, train=train)
        dp3 = head(f1, "out_conv_dp3")
        f2 = up(2)(f1, x2, train=train)
        dp2 = head(f2, "out_conv_dp2")
        f3 = up(3)(f2, x1, train=train)
        dp1 = head(f3, "out_conv_dp1")
        f4 = up(4)(f3, x0, train=train)
        dp0 = nn.Conv(self.num_classes, (3, 3), padding=1, dtype=jnp.float32,
                      name="out_conv")(f4)
        return {
            "bottleneck": x4, "f1": f1, "f2": f2, "f3": f3, "f4": f4,
            "dp0": dp0, "dp1": dp1, "dp2": dp2, "dp3": dp3,
        }


class DecoderDS(DeepSupervisionDecoder):
    """Decoder_DS (CCT/CCT_unet.py:156-206): Decoder_mcps minus the
    feature taps — returns only the four multi-scale seg heads
    (dp0, dp1, dp2, dp3). Dead code in the reference (no trainer
    instantiates it); included for inventory completeness. The
    reference also defines an `out_conv_dp4` head it never calls —
    deliberately omitted here (documented deviation)."""

    @nn.compact
    def __call__(self, feats, out_hw, train: bool = False):
        outs = super().__call__(feats, out_hw, train=train)
        return outs["dp0"], outs["dp1"], outs["dp2"], outs["dp3"]


def _maybe_remat(remat: bool):
    """(Encoder, Decoder) classes, rematerialized per-segment when asked.

    Remat trades ~1/3 extra forward FLOPs for not storing each segment's
    activations for the backward pass — the decisive knob for fitting the
    double-forward 4-decoder step in HBM at 256x256 batch 16
    (jax.checkpoint via nn.remat; `train` is static argnum 2).
    """
    if not remat:
        return Encoder, Decoder
    return (nn.remat(Encoder, static_argnums=(2,)),
            nn.remat(Decoder, static_argnums=(2, 3)))  # train, return_feat


class UNet(nn.Module):
    """Plain single-decoder U-Net (UAPS_unet.py:188-205 /
    baseline_unet.py:159-176)."""
    num_classes: int
    features: Tuple[int, ...] = UNET_FEATURES
    dropout: Tuple[float, ...] = UNET_DROPOUT
    bilinear: bool = True  # see UpBlock docstring: reference default-arg trap
    dtype: Dtype = jnp.float32
    remat: bool = False
    nchw_levels: int = 0
    conv_backend: str = "auto"
    conv_variant: str = "taps"
    head_variant: str = "taps"
    dropout_backend: str = "auto"
    pool_backend: str = "auto"
    bn_backend: str = "auto"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        enc_cls, dec_cls = _maybe_remat(self.remat)
        feats = enc_cls(self.features, self.dropout, self.dtype,
                        self.nchw_levels, self.conv_backend,
                        self.conv_variant, self.dropout_backend,
                        pool_backend=self.pool_backend,
                        bn_backend=self.bn_backend,
                        name="encoder")(x, train)
        return dec_cls(self.num_classes, self.features, self.bilinear,
                       self.dtype, self.nchw_levels, self.conv_backend,
                       self.conv_variant, self.head_variant,
                       bn_backend=self.bn_backend,
                       name="decoder")(feats, train)


class MultiDecoderUNet(nn.Module):
    """Shared encoder + main decoder + N perturbed auxiliary decoders.

    Parameterization covers the reference's whole multi-decoder family:
      UNet_UAPS / UNet_CCT: perturbations=('feature_noise','dropout',
                                           'feature_dropout')
      UNet_UCC:             perturbations=('feature_noise',)
      UNet_CCPS:            perturbations=('feature_dropout',)
    The encoder runs ONCE and every decoder traces into the same jitted
    forward — the aux-decoder count is a static config, so XLA sees one
    fused program (SURVEY.md §7 M4; the reference's per-call module
    re-instantiation at UAPS_unet.py:227-232 becomes key-splitting).

    During eval (`train=False`) perturbations still apply if rngs are given
    (reference applies them unconditionally); use `main_only` for the
    validation path, which the reference effectively uses by discarding aux
    outputs (UAPS_train.py:377).
    """
    num_classes: int
    perturbations: Tuple[str, ...] = ("feature_noise", "dropout",
                                      "feature_dropout")
    features: Tuple[int, ...] = UNET_FEATURES
    dropout: Tuple[float, ...] = UNET_DROPOUT
    bilinear: bool = True  # see UpBlock docstring: reference default-arg trap
    dtype: Dtype = jnp.float32
    remat: bool = False
    nchw_levels: int = 0
    conv_backend: str = "auto"
    conv_variant: str = "taps"
    head_variant: str = "taps"
    dropout_backend: str = "auto"
    pool_backend: str = "auto"
    bn_backend: str = "auto"
    packed_heads: bool = False  # see _packed_heads_out

    def setup(self):
        enc_cls, dec_cls = _maybe_remat(self.remat)
        self.encoder = enc_cls(self.features, self.dropout, self.dtype,
                               self.nchw_levels, self.conv_backend,
                               self.conv_variant, self.dropout_backend,
                               pool_backend=self.pool_backend,
                               bn_backend=self.bn_backend)
        self.main_decoder = dec_cls(self.num_classes, self.features,
                                    self.bilinear, self.dtype,
                                    self.nchw_levels, self.conv_backend,
                                    self.conv_variant, self.head_variant,
                                    bn_backend=self.bn_backend)
        self.aux_decoders = [
            dec_cls(self.num_classes, self.features, self.bilinear,
                    self.dtype, self.nchw_levels, self.conv_backend,
                    self.conv_variant, self.head_variant,
                    bn_backend=self.bn_backend,
                    name=f"aux_decoder{i + 1}")
            for i in range(len(self.perturbations))
        ]

    @property
    def feat_channel_axes(self):
        """Per-skip-tensor feature axis (1 for NCHW levels, else -1)."""
        return [1 if _level_layout(i, self.nchw_levels) == "nchw" else -1
                for i in range(5)]

    def __call__(self, x, *, train: bool = False):
        feats = self.encoder(x, train)
        packed = self._use_packed_heads(feats)
        outputs = [self.main_decoder(feats, train, packed)]
        if self.perturbations:
            key = self.make_rng("perturb")
            keys = jax.random.split(key, len(self.perturbations))
            axes = self.feat_channel_axes
            for k, kind, dec in zip(keys, self.perturbations,
                                    self.aux_decoders):
                pfeats = perturb_features(k, feats, kind, axes,
                                          backend=self.conv_backend)
                outputs.append(dec(pfeats, train, packed))
        if packed:
            return self._packed_heads_out(outputs)
        return tuple(outputs)

    def _use_packed_heads(self, feats) -> bool:
        return (self.packed_heads
                and _level_layout(0, self.nchw_levels) == "nchw"
                and self.head_variant != "xla")

    def _packed_heads_out(self, rfeats):
        """Run the 1+n_aux out_conv heads as ONE block-diagonal conv
        (VERDICT r3 #2): each head is Cout=n_cls (4 of 128 MXU rows);
        channel-concatenating the D final features and block-stacking
        the kernels turns D x 9 tiny matmuls into 9 matmuls at
        K = D*16, M = D*n_cls. The off-block weights are zero, their
        gradients are discarded by the .set() VJP, and each decoder
        still owns its out_conv params — semantics and tree unchanged.
        Matches reference UAPS_unet.py:139,152 (out_conv per decoder)."""
        d = len(rfeats)
        ncls = self.num_classes
        cin = rfeats[0][0].shape[1]
        dt = self.dtype
        xcat = jnp.concatenate([x for x, _, _ in rfeats], axis=1)
        wblk = jnp.zeros((3, 3, d * cin, d * ncls), jnp.float32)
        for i, (_, k, _) in enumerate(rfeats):
            wblk = wblk.at[:, :, i * cin:(i + 1) * cin,
                           i * ncls:(i + 1) * ncls].set(k)
        h, w = xcat.shape[2], xcat.shape[3]
        use_pallas = (
            self.conv_backend != "xla"
            and jax.devices()[0].platform == "tpu"
            and h >= 128 and w >= 128 and h % 8 == 0 and w % 128 == 0
            and d * cin <= 64 and d * ncls <= 32
        )
        if use_pallas:
            from uaps_tpu.pallas.conv3x3_nchw import conv3x3_fast_nchw
            variant = (self.head_variant
                       if self.head_variant in ("taps", "im2col", "dhdw",
                                                "dwnp") else "taps")
            y = conv3x3_fast_nchw(xcat.astype(dt), wblk.astype(dt), False,
                                  variant, jnp.float32)
        else:
            y = jax.lax.conv_general_dilated(
                xcat.astype(jnp.float32), wblk, (1, 1), "SAME",
                dimension_numbers=("NCHW", "HWIO", "NCHW"))
        outs = []
        for i, (_, _, b) in enumerate(rfeats):
            o = (y[:, i * ncls:(i + 1) * ncls]
                 + b.astype(jnp.float32)[None, :, None, None])
            outs.append(to_nhwc(o))
        return tuple(outs)

    def main_only(self, x, *, train: bool = False):
        """Encoder + main decoder only — the eval fast path."""
        feats = self.encoder(x, train)
        return self.main_decoder(feats, train)

    def encode(self, x, train: bool = False):
        """Encoder features only (for the stacked-decoder fast path)."""
        return self.encoder(x, train)


def stacked_decoder_apply(model: "MultiDecoderUNet", params, batch_stats,
                          feats_stacked, train: bool = False):
    """Run main + aux decoders as ONE vmapped Decoder over stacked params.

    The sequential path traces 1+n_aux separate decoder op-chains; on the
    TPU that is 4x the XLA kernel count at 1/4 the per-op size. Stacking
    the per-decoder param/batch-stat subtrees on a leading axis and
    vmapping a single bare Decoder keeps the stored variable tree
    IDENTICAL (stack/unstack happen per step on ~0.45M-param subtrees) so
    checkpoints, the torch importer, and eval paths are unaffected.
    Semantics are exactly the sequential path's: same params, same
    per-decoder BN batch stats.

    feats_stacked: list of per-scale arrays [D, B, h, w, c] where row 0 is
    the raw features (main decoder) and rows 1.. are the perturbed copies.
    Returns (logits [D, B, H, W, n_cls], {decoder_name: new_batch_stats}).
    """
    names = ["main_decoder"] + [
        f"aux_decoder{i + 1}" for i in range(len(model.perturbations))]
    p = jax.tree.map(lambda *ls: jnp.stack(ls), *[params[n] for n in names])
    bs = jax.tree.map(lambda *ls: jnp.stack(ls),
                      *[batch_stats[n] for n in names])
    dec = Decoder(model.num_classes, model.features, model.bilinear,
                  model.dtype, model.nchw_levels, model.conv_backend,
                  model.conv_variant, model.head_variant,
                  bn_backend=model.bn_backend)

    def one(pp, bb, feats):
        out, mut = dec.apply({"params": pp, "batch_stats": bb}, feats,
                             train, mutable=["batch_stats"])
        return out, mut["batch_stats"]

    if model.remat:
        one = jax.checkpoint(one)
    outs, new_bs = jax.vmap(one)(p, bs, feats_stacked)
    unstacked = {
        n: jax.tree.map(lambda l, _i=i: l[_i], new_bs)
        for i, n in enumerate(names)
    }
    return outs, unstacked


class DeepSupervisionUNet(nn.Module):
    """Encoder + Decoder_mcps with optional input perturbation.

    Covers m_unet.py UNet_f (perturbation='none'), UNet_g
    ('feature_dropout'), UNet_h ('feature_noise').
    """
    num_classes: int
    perturbation: str = "none"
    features: Tuple[int, ...] = UNET_FEATURES
    dropout: Tuple[float, ...] = UNET_DROPOUT
    bilinear: bool = True  # see UpBlock docstring: reference default-arg trap
    dtype: Dtype = jnp.float32
    remat: bool = False
    conv_backend: str = "auto"
    conv_variant: str = "taps"

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        enc_cls, _ = _maybe_remat(self.remat)
        ds_cls = (nn.remat(DeepSupervisionDecoder, static_argnums=(2, 3))
                  if self.remat else DeepSupervisionDecoder)
        feats = enc_cls(self.features, self.dropout, self.dtype,
                        conv_backend=self.conv_backend,
                        conv_variant=self.conv_variant,
                        name="encoder")(x, train)
        if self.perturbation != "none":
            key = self.make_rng("perturb")
            feats = perturb_features(key, feats, self.perturbation,
                                     backend=self.conv_backend)
        return ds_cls(
            self.num_classes, self.features, self.bilinear, self.dtype,
            conv_backend=self.conv_backend, conv_variant=self.conv_variant,
            name="main_decoder",
        )(feats, x.shape[1:3], train)
