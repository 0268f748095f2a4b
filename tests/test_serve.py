"""Inference-engine tests (uaps_tpu/serve.py).

The reference's only serving story is bs=1 notebook loops
(UAPS-Testing.ipynb cells 11-19); the engine replaces them with a
compiled fixed-shape predictor + padding micro-batcher.
"""
import dataclasses

import numpy as np
import pytest

import jax

from uaps_tpu.methods import get_method
from uaps_tpu.serve import InferenceEngine
from uaps_tpu.utils.config import preset


@pytest.fixture(scope="module")
def engine():
    cfg = preset("synthetic", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                   batch_size=4)
    method = get_method("uaps")
    state, _ = method.init_state(cfg, jax.random.key(0))
    return cfg, InferenceEngine(cfg, params=state.params,
                                batch_stats=state.batch_stats)


class TestInferenceEngine:
    def test_predict_shapes_uint8(self, engine):
        cfg, eng = engine
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (3, 32, 32, 3)).astype(np.uint8)
        masks, probs = eng.predict(imgs)
        assert masks.shape == (3, 32, 32) and masks.dtype == np.int32
        assert probs.shape == (3, 32, 32, cfg.data.num_classes)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-3)

    def test_microbatch_padding_irrelevant(self, engine):
        """N not divisible by batch_size: padded tail must not leak."""
        _, eng = engine
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 255, (6, 32, 32, 3)).astype(np.uint8)
        masks6, _ = eng.predict(imgs)        # 4 + 2(padded to 4)
        masks2, _ = eng.predict(imgs[4:])    # the tail alone
        np.testing.assert_array_equal(masks6[4:], masks2)

    def test_uncertainty_map(self, engine):
        _, eng = engine
        rng = np.random.default_rng(2)
        imgs = rng.integers(0, 255, (2, 32, 32, 3)).astype(np.uint8)
        u = eng.uncertainty(imgs)
        assert u.shape == (2, 32, 32)
        assert np.isfinite(u).all() and (u >= 0).all()

    def test_float_input_passthrough(self, engine):
        _, eng = engine
        rng = np.random.default_rng(3)
        imgs = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
        masks, _ = eng.predict(imgs)
        assert masks.shape == (2, 32, 32)


class TestExport:
    def test_export_roundtrip_matches_engine(self, engine, tmp_path):
        """InferenceEngine.export() -> single-file artifact ->
        ExportedEngine reproduces the live engine bit-for-bit (same
        masks, same probs), including normalization and the padding
        micro-batcher, with no model/config code needed at load."""
        from uaps_tpu.serve import ExportedEngine
        _, eng = engine
        path = str(tmp_path / "uaps.jaxexport")
        eng.export(path)
        loaded = ExportedEngine(path)
        assert loaded.meta["num_classes"] == 4
        rng = np.random.default_rng(2)
        imgs = rng.integers(0, 255, (5, 32, 32, 3)).astype(np.uint8)
        m1, p1 = eng.predict(imgs)
        m2, p2 = loaded.predict(imgs)
        np.testing.assert_array_equal(m1, m2)
        np.testing.assert_allclose(p1, p2, rtol=1e-6, atol=1e-7)


class TestFromTorch:
    def test_serve_reference_pth_directly(self, tmp_path):
        """Reference-format .pth (UAPS_train.py:442-450 layout) straight
        into the inference engine — the reference user's serving path."""
        import sys
        import torch
        sys.path.insert(0, "/root/reference")
        from utilities.UAPS_unet import UNet_UAPS

        tm = UNet_UAPS(3, 4)
        tm.eval()
        path = str(tmp_path / "ref.pth")
        torch.save({"epoch": 1, "state_dict": tm.state_dict()}, path)

        cfg = preset("synthetic", method="uaps")
        cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                       batch_size=2)
        eng = InferenceEngine.from_torch(cfg, path)
        imgs = np.random.default_rng(0).integers(
            0, 255, (2, 32, 32, 3)).astype(np.uint8)
        masks, probs = eng.predict(imgs)
        assert masks.shape == (2, 32, 32)
        assert np.isfinite(probs).all()

        # parity: same input through the torch model agrees on argmax
        x = (imgs.astype(np.float32) / 255.0 - np.asarray(cfg.data.mean)) \
            / np.asarray(cfg.data.std)
        with torch.no_grad():
            feats = tm.encoder(torch.from_numpy(
                x.transpose(0, 3, 1, 2)).float())
            tlogits = tm.main_decoder(feats).numpy().transpose(0, 2, 3, 1)
        agree = (tlogits.argmax(-1) == masks).mean()
        assert agree > 0.99, agree
