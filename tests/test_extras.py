"""ResNet/BaseNet, binary loss library, RLE codecs, initializers."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from uaps_tpu.models.resnet import (resnet18, resnet50, BaseNet,
                                    resize_align_corners)
from uaps_tpu.ops import losses_binary as LB
from uaps_tpu.utils.rle import mask2rle, make_mask


class TestResNet:
    def test_resnet18_feature_shapes(self):
        m = resnet18()
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init({"params": jax.random.key(0)}, x, train=False)
        c1, c2, c3, c4 = m.apply(v, x, train=False)
        assert c1.shape == (1, 16, 16, 64)
        assert c2.shape == (1, 8, 8, 128)
        assert c3.shape == (1, 4, 4, 256)
        assert c4.shape == (1, 2, 2, 512)

    def test_resnet50_dilated_output_stride_8(self):
        # replace_stride_with_dilation=[F,T,T] -> c3, c4 keep c2's stride
        m = resnet50()
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init({"params": jax.random.key(0)}, x, train=False)
        c1, c2, c3, c4 = m.apply(v, x, train=False)
        assert c1.shape == (1, 16, 16, 256)
        assert c2.shape == (1, 8, 8, 512)
        assert c3.shape == (1, 8, 8, 1024)   # dilated, stride kept
        assert c4.shape == (1, 8, 8, 2048)

    def test_resnet18_param_count_matches_torchvision_trunk(self):
        """Conv+BN trunk of torchvision resnet18 (no fc) = 11,176,512."""
        m = resnet18()
        x = jnp.zeros((1, 32, 32, 3))
        v = m.init({"params": jax.random.key(0)}, x, train=False)
        n = sum(p.size for p in jax.tree.leaves(v["params"]))
        assert n == 11_176_512

    def test_basenet_tta(self):
        m = BaseNet(backbone="resnet18", num_classes=4)
        x = jnp.zeros((1, 32, 32, 3))
        v = m.init({"params": jax.random.key(0)}, x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == (1, 32, 32, 4)
        tta = m.apply(v, x, train=False, tta=True)
        assert tta.shape == (1, 32, 32, 4)
        # TTA sums 10 softmax fields (5 scales x 2 flips)
        np.testing.assert_allclose(np.asarray(tta.sum(-1)), 10.0, rtol=1e-3)


class TestFlipTTA:
    def test_flip_tta_softmax_unflips_correctly(self):
        """With a POINTWISE forward, flipping the input then unflipping
        the probs must cancel exactly — every TTA term equals the plain
        softmax, so any H/V axis mix-up in the unflip shows up."""
        import jax
        import jax.numpy as jnp
        from uaps_tpu.ops.tta import flip_tta_softmax
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.standard_normal((2, 8, 10, 3)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 4)), jnp.float32)

        def forward(variables, x):
            return x @ variables["w"]

        out = flip_tta_softmax(forward, {"w": w}, img)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jax.nn.softmax(img @ w, axis=-1)),
            rtol=1e-6, atol=1e-6)


class TestResizeAlignCorners:
    def test_matches_torch_arbitrary_size(self, rng):
        a = rng.standard_normal((1, 9, 13, 2)).astype(np.float32)
        ours = np.asarray(resize_align_corners(jnp.asarray(a), (5, 21)))
        theirs = F.interpolate(
            torch.from_numpy(a.transpose(0, 3, 1, 2)), size=(5, 21),
            mode="bilinear", align_corners=True
        ).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


class TestBinaryLosses:
    def _pair(self, rng):
        logits = rng.standard_normal((2, 16, 16, 1)).astype(np.float32)
        targets = rng.integers(0, 2, (2, 16, 16, 1)).astype(np.float32)
        return logits, targets

    def test_iou_f1_match_torch_recipe(self, rng):
        logits, targets = self._pair(rng)
        pr = torch.sigmoid(torch.from_numpy(logits))
        gt = torch.from_numpy(targets)
        inter = float(torch.sum(gt * pr))
        union = float(torch.sum(gt) + torch.sum(pr)) - inter + 1e-7
        np.testing.assert_allclose(
            float(LB.iou_score(jnp.asarray(logits), jnp.asarray(targets))),
            (inter + 1e-7) / union, rtol=1e-5)
        tp = inter
        fp = float(torch.sum(pr)) - tp
        fn = float(torch.sum(gt)) - tp
        f1 = (2 * tp + 1e-7) / (2 * tp + fn + fp + 1e-7)
        np.testing.assert_allclose(
            float(LB.f_score(jnp.asarray(logits), jnp.asarray(targets))),
            f1, rtol=1e-5)

    def test_bce_dice_combo(self, rng):
        logits, targets = self._pair(rng)
        dice = 1 - float(LB.f_score(jnp.asarray(logits), jnp.asarray(targets)))
        bce = float(F.binary_cross_entropy_with_logits(
            torch.from_numpy(logits), torch.from_numpy(targets)))
        np.testing.assert_allclose(
            float(LB.bce_dice_loss(jnp.asarray(logits), jnp.asarray(targets))),
            0.4 * dice + 0.6 * bce, rtol=1e-4)

    def test_binary_focal_matches_torch_recipe(self, rng):
        logits, targets = self._pair(rng)
        probs = 1 / (1 + np.exp(-logits))
        bce = F.binary_cross_entropy(
            torch.from_numpy(probs), torch.from_numpy(targets),
            reduction="none")
        pt = torch.exp(-bce)
        theirs = float((0.8 * (1 - pt) ** 2 * bce).mean())
        ours = float(LB.binary_focal_loss(jnp.asarray(probs),
                                          jnp.asarray(targets)))
        np.testing.assert_allclose(ours, theirs, rtol=1e-4)

    def test_super_and_kl(self, rng):
        logits, targets = self._pair(rng)
        s = LB.super_loss(jnp.asarray(logits), jnp.asarray(logits),
                          jnp.asarray(targets), jnp.asarray(targets))
        np.testing.assert_allclose(
            float(s),
            2 * float(LB.bce_dice_loss(jnp.asarray(logits),
                                       jnp.asarray(targets))), rtol=1e-5)
        p = jax.nn.softmax(jnp.asarray(rng.standard_normal((4, 3))), -1)
        q = jax.nn.softmax(jnp.asarray(rng.standard_normal((4, 3))), -1)
        theirs = float(F.kl_div(torch.from_numpy(np.log(np.asarray(p))),
                                torch.from_numpy(np.asarray(q)),
                                reduction="mean"))
        np.testing.assert_allclose(float(LB.kl_loss(p, q)), theirs,
                                   rtol=1e-4)


class TestRLE:
    def test_roundtrip(self, rng):
        mask = (rng.random((8, 12)) > 0.6).astype(np.float32)
        rle = mask2rle(mask)
        back = make_mask([rle], shape=(8, 12), n_classes=1)[..., 0]
        np.testing.assert_array_equal(back, mask)

    def test_empty(self):
        assert mask2rle(np.zeros((4, 4))) == ""
        assert make_mask([""], shape=(4, 4), n_classes=1).sum() == 0


class TestInitializers:
    def test_apply_initializer_changes_convs_only(self):
        from uaps_tpu.models import net_factory
        from uaps_tpu.models.initializers import apply_initializer
        m = net_factory("unet", class_num=4)
        x = jnp.zeros((1, 32, 32, 3))
        v = m.init({"params": jax.random.key(0), "dropout": jax.random.key(1),
                    "perturb": jax.random.key(2)}, x, train=False)
        new = apply_initializer(v["params"], jax.random.key(3),
                                "xavier_uniform")
        changed = [not np.allclose(a, b) for a, b in
                   zip(jax.tree.leaves(v["params"]), jax.tree.leaves(new))
                   if a.ndim == 4]
        unchanged = [np.allclose(a, b) for a, b in
                     zip(jax.tree.leaves(v["params"]), jax.tree.leaves(new))
                     if a.ndim != 4]
        assert all(changed) and all(unchanged)
