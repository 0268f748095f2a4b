"""Numerical architecture parity: reference torch model vs our Flax model.

The strongest parity test in the suite: instantiate the ACTUAL reference
models (read-only import from /root/reference), convert their weights with
utils.torch_import, and assert the two frameworks produce the same logits
on the same input (eval mode, main path — deterministic on both sides).
This pins conv layout, BN semantics, LeakyReLU slope, conv1x1+bilinear
upsampling, and skip-concat ordering all at once.
"""
import sys

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from uaps_tpu.models import net_factory
from uaps_tpu.utils.torch_import import convert_state_dict


def _init_flax(model, x):
    return model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "perturb": jax.random.key(2)}, x, train=False)


def _to_nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


@pytest.fixture(scope="module")
def rng_input():
    rng = np.random.default_rng(7)
    return rng.standard_normal((2, 64, 64, 3)).astype(np.float32)


class TestForwardParity:
    def test_unet_uaps_main_decoder(self, rng_input):
        from utilities.UAPS_unet import UNet_UAPS
        tm = UNet_UAPS(3, 4)
        tm.eval()
        ours = net_factory("unet_uaps", class_num=4)
        variables = _init_flax(ours, jnp.asarray(rng_input))
        params, stats = convert_state_dict(
            tm.state_dict(), variables["params"], variables["batch_stats"])

        with torch.no_grad():
            feats = tm.encoder(_to_nchw(rng_input))
            theirs = tm.main_decoder(feats).numpy().transpose(0, 2, 3, 1)
        mine = np.asarray(ours.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(rng_input), train=False, method=ours.main_only))
        np.testing.assert_allclose(mine, theirs, rtol=1e-3, atol=1e-4)

    def test_unet_baseline(self, rng_input):
        from utilities.baseline_unet import UNet
        tm = UNet(3, 4)
        tm.eval()
        ours = net_factory("unet", class_num=4)
        variables = _init_flax(ours, jnp.asarray(rng_input))
        params, stats = convert_state_dict(
            tm.state_dict(), variables["params"], variables["batch_stats"])
        with torch.no_grad():
            theirs = tm(_to_nchw(rng_input)).numpy().transpose(0, 2, 3, 1)
        mine = np.asarray(ours.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(rng_input), train=False))
        np.testing.assert_allclose(mine, theirs, rtol=1e-3, atol=1e-4)

    def test_training_dict_format(self, tmp_path, rng_input):
        """The reference saves {'state_dict': ..., 'optimizer': ...}
        (UAPS_train.py:442-450) behind DataParallel ('module.' prefix)."""
        from utilities.UAPS_unet import UNet_UAPS
        from uaps_tpu.utils.torch_import import load_pth
        tm = torch.nn.DataParallel(UNet_UAPS(3, 4))
        path = tmp_path / "ckpt.pth"
        torch.save({"epoch": 3, "best_dice_1": 0.5,
                    "state_dict": tm.state_dict()}, path)
        ours = net_factory("unet_uaps", class_num=4)
        variables = _init_flax(ours, jnp.asarray(rng_input))
        params, stats = load_pth(str(path), variables["params"],
                                 variables["batch_stats"])
        tm.eval()
        with torch.no_grad():
            feats = tm.module.encoder(_to_nchw(rng_input))
            theirs = tm.module.main_decoder(feats).numpy()
        mine = np.asarray(ours.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(rng_input), train=False, method=ours.main_only))
        np.testing.assert_allclose(
            mine, theirs.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4)


class TestExport:
    def test_roundtrip_via_torch(self, rng_input):
        """ours -> torch state_dict -> reference model forward == ours."""
        from utilities.UAPS_unet import UNet_UAPS
        from uaps_tpu.utils.torch_import import export_state_dict
        ours = net_factory("unet_uaps", class_num=4)
        variables = _init_flax(ours, jnp.asarray(rng_input))
        sd = export_state_dict(variables["params"],
                               variables["batch_stats"])
        tm = UNet_UAPS(3, 4)
        missing, unexpected = tm.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in sd.items()}, strict=False)
        assert not unexpected
        # only num_batches_tracked-style buffers may be missing
        assert all("num_batches_tracked" in m for m in missing)
        tm.eval()
        with torch.no_grad():
            feats = tm.encoder(_to_nchw(rng_input))
            theirs = tm.main_decoder(feats).numpy().transpose(0, 2, 3, 1)
        mine = np.asarray(ours.apply(
            variables, jnp.asarray(rng_input), train=False,
            method=ours.main_only))
        np.testing.assert_allclose(mine, theirs, rtol=1e-3, atol=1e-4)

    def test_save_pth_loadable(self, tmp_path, rng_input):
        from uaps_tpu.utils.torch_import import save_pth, load_pth
        ours = net_factory("unet", class_num=4)
        variables = _init_flax(ours, jnp.asarray(rng_input))
        path = str(tmp_path / "export.pth")
        save_pth(path, variables["params"], variables["batch_stats"],
                 extra={"epoch": 5})
        params, stats = load_pth(path, variables["params"],
                                 variables["batch_stats"])
        for a, b in zip(jax.tree.leaves(variables["params"]),
                        jax.tree.leaves(params)):
            np.testing.assert_allclose(np.asarray(a), b, rtol=1e-6)
