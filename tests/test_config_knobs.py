"""Every config-enum value must stay RUNNABLE (VERDICT r3 #8).

The perf work leaves many measured-and-rejected variants behind as
ablation knobs (conv variants, head/pool/bn/dropout backends,
stack_decoders, fused_batch, ...). A knob value that crashes is a
config-by-copy bug in disguise (SURVEY.md §7) — this sweep runs ONE
tiny train step per enum value so dead options fail loudly in CI.

On CPU several values route to their documented fallbacks (pallas paths
are platform-gated); the sweep still exercises the dispatch logic and
the fallback itself.
"""
import dataclasses

import numpy as np
import pytest

import jax

from uaps_tpu.data.synthetic import SyntheticDefects
from uaps_tpu.methods import get_method, base as mbase
from uaps_tpu.utils.config import preset


def _tiny(method="uaps", **model_kw):
    cfg = preset("synthetic", method=method)
    cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                   batch_size=4)
    if model_kw:
        cfg.model = dataclasses.replace(cfg.model, **model_kw)
    return cfg


def _one_step(cfg):
    method = get_method(cfg.method.name)
    state, model = method.init_state(cfg, jax.random.key(0))
    tx = mbase.make_optimizer(cfg.optim)
    step = jax.jit(method.make_train_step(cfg, model, tx))
    data = SyntheticDefects(cfg.data, seed=0)
    batch = next(iter(data.train_iter()))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"])), cfg.model
    return float(metrics["loss"])


CONV_BACKENDS = ["auto", "fused", "chain", "xla"]
CONV_VARIANTS = ["taps", "im2col", "dhdw", "flat", "dwout", "dwnp",
                 "dwm", "dwmf", "fullh"]
HEAD_VARIANTS = ["taps", "im2col", "dhdw", "dwnp", "dwm", "dwmf", "xla"]
DROPOUT_BACKENDS = ["auto", "xla", "pallas"]
POOL_BACKENDS = ["auto", "pallas", "maskpool", "xla"]
BN_BACKENDS = ["auto", "4d", "flat"]


class TestEveryKnobRuns:
    @pytest.mark.parametrize("v", CONV_BACKENDS)
    def test_conv_backend(self, v):
        _one_step(_tiny(conv_backend=v))

    @pytest.mark.parametrize("v", CONV_VARIANTS)
    def test_conv_variant(self, v):
        _one_step(_tiny(conv_variant=v))

    @pytest.mark.parametrize("v", HEAD_VARIANTS)
    def test_head_variant(self, v):
        _one_step(_tiny(head_variant=v))

    @pytest.mark.parametrize("v", DROPOUT_BACKENDS)
    def test_dropout_backend(self, v):
        _one_step(_tiny(dropout_backend=v))

    @pytest.mark.parametrize("v", POOL_BACKENDS)
    def test_pool_backend(self, v):
        _one_step(_tiny(pool_backend=v))

    @pytest.mark.parametrize("v", BN_BACKENDS)
    def test_bn_backend(self, v):
        _one_step(_tiny(bn_backend=v))

    @pytest.mark.parametrize("flag", ["stack_decoders", "packed_heads",
                                      "remat"])
    def test_model_bools(self, flag):
        _one_step(_tiny(**{flag: True}))

    @pytest.mark.parametrize("nchw", [0, 1, 2, 5])
    def test_nchw_levels(self, nchw):
        _one_step(_tiny(nchw_levels=nchw))

    def test_method_fused_batch_and_uncertainty(self):
        for kw in ({"fused_batch": True}, {"fused_uncertainty": False}):
            cfg = _tiny()
            cfg.method = dataclasses.replace(cfg.method, **kw)
            _one_step(cfg)

    def test_unknown_enum_raises(self):
        # a typo'd value must error, not silently run a default
        with pytest.raises(Exception):
            _one_step(_tiny(conv_variant="tapss"))
