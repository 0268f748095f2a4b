"""Loss semantics pinned against torch (the framework the reference uses).

Rather than porting numbers by hand, we call the same torch functionals the
reference calls (F.cross_entropy, F.kl_div, softmax/one-hot dice recipe) and
assert our jnp implementations agree to float32 tolerance.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from uaps_tpu.ops import losses

pytestmark = pytest.mark.fast


def _rand_logits_labels(rng, b=2, h=17, w=19, c=4):
    logits = rng.standard_normal((b, h, w, c)).astype(np.float32) * 3.0
    labels = rng.integers(0, c, size=(b, h, w)).astype(np.int32)
    return logits, labels


def _to_torch_nchw(logits_nhwc):
    return torch.from_numpy(np.transpose(logits_nhwc, (0, 3, 1, 2)))


class TestCrossEntropy:
    def test_matches_torch(self, rng):
        logits, labels = _rand_logits_labels(rng)
        ours = losses.cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels))
        theirs = F.cross_entropy(
            _to_torch_nchw(logits), torch.from_numpy(labels).long()
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)

    def test_weighted_matches_torch(self, rng):
        logits, labels = _rand_logits_labels(rng)
        w = np.array([0.2, 1.0, 2.0, 0.5], dtype=np.float32)
        ours = losses.cross_entropy_loss(
            jnp.asarray(logits), jnp.asarray(labels), weight=jnp.asarray(w)
        )
        theirs = F.cross_entropy(
            _to_torch_nchw(logits), torch.from_numpy(labels).long(),
            weight=torch.from_numpy(w),
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)

    def test_ignore_index(self, rng):
        logits, labels = _rand_logits_labels(rng)
        labels_ig = labels.copy()
        labels_ig[0, :5, :] = 255
        ours = losses.cross_entropy_loss(
            jnp.asarray(logits), jnp.asarray(labels_ig), ignore_index=255
        )
        theirs = F.cross_entropy(
            _to_torch_nchw(logits),
            torch.from_numpy(labels_ig).long(),
            ignore_index=255,
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-5)


class TestDice:
    def _torch_reference_dice(self, labels, logits_nchw, eps=1e-7):
        """The exact recipe of reference pytorch_losses.py:54-89."""
        true = torch.from_numpy(labels).long().unsqueeze(1)
        logits = logits_nchw
        num_classes = logits.shape[1]
        true_1_hot = torch.eye(num_classes)[true.squeeze(1)]
        true_1_hot = true_1_hot.permute(0, 3, 1, 2).float()
        probas = F.softmax(logits, dim=1)
        dims = (0,) + tuple(range(2, true.ndimension()))
        intersection = torch.sum(probas * true_1_hot, dims)
        cardinality = torch.sum(probas + true_1_hot, dims)
        return float(1 - (2.0 * intersection / (cardinality + eps)).mean())

    def test_matches_reference_recipe(self, rng):
        logits, labels = _rand_logits_labels(rng)
        ours = losses.softmax_dice_loss(jnp.asarray(logits), jnp.asarray(labels))
        theirs = self._torch_reference_dice(labels, _to_torch_nchw(logits))
        np.testing.assert_allclose(float(ours), theirs, rtol=1e-5)

    def test_perfect_prediction_near_zero(self):
        labels = np.zeros((1, 8, 8), np.int32)
        labels[0, :4] = 1
        logits = np.full((1, 8, 8, 2), -20.0, np.float32)
        logits[..., 0] = np.where(labels[0] == 0, 20.0, -20.0)
        logits[..., 1] = np.where(labels[0] == 1, 20.0, -20.0)
        val = float(losses.softmax_dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
        assert val < 1e-5

    def test_gradient_finite(self, rng):
        logits, labels = _rand_logits_labels(rng, b=1, h=8, w=8)
        g = jax.grad(
            lambda lg: losses.softmax_dice_loss(lg, jnp.asarray(labels))
        )(jnp.asarray(logits))
        assert np.all(np.isfinite(np.asarray(g)))


class TestJaccardTversky:
    def test_tversky_half_equals_dice(self, rng):
        logits, labels = _rand_logits_labels(rng)
        dice = losses.softmax_dice_loss(jnp.asarray(logits), jnp.asarray(labels))
        tv = losses.tversky_loss(
            jnp.asarray(logits), jnp.asarray(labels), alpha=0.5, beta=0.5
        )
        np.testing.assert_allclose(float(dice), float(tv), rtol=1e-4)

    def test_jaccard_worse_than_dice(self, rng):
        logits, labels = _rand_logits_labels(rng)
        dice = float(losses.softmax_dice_loss(jnp.asarray(logits), jnp.asarray(labels)))
        jac = float(losses.jaccard_loss(jnp.asarray(logits), jnp.asarray(labels)))
        assert jac >= dice  # IoU <= Dice always


class TestConsistency:
    def test_softmax_mse_elementwise(self, rng):
        a, _ = _rand_logits_labels(rng)
        b, _ = _rand_logits_labels(rng)
        ours = losses.softmax_mse_loss(jnp.asarray(a), jnp.asarray(b))
        pa = F.softmax(_to_torch_nchw(a), dim=1)
        pb = F.softmax(_to_torch_nchw(b), dim=1)
        theirs = np.transpose(((pa - pb) ** 2).numpy(), (0, 2, 3, 1))
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-4, atol=1e-6)

    def test_softmax_kl_matches_torch_mean(self, rng):
        a, _ = _rand_logits_labels(rng)
        b, _ = _rand_logits_labels(rng)
        ours = losses.softmax_kl_loss(jnp.asarray(a), jnp.asarray(b))
        theirs = F.kl_div(
            F.log_softmax(_to_torch_nchw(a), dim=1),
            F.softmax(_to_torch_nchw(b), dim=1),
            reduction="mean",
        )
        np.testing.assert_allclose(float(ours), float(theirs), rtol=1e-4)

    def test_kl_divergence_map_matches_torch(self, rng):
        """The UAPS variance map: KLDivLoss(reduction='none') summed over C."""
        a, _ = _rand_logits_labels(rng)
        b, _ = _rand_logits_labels(rng)
        preds_t = F.softmax(_to_torch_nchw(b), dim=1)
        theirs = torch.sum(
            torch.nn.KLDivLoss(reduction="none")(
                F.log_softmax(_to_torch_nchw(a), dim=1), preds_t
            ),
            dim=1,
        ).numpy()
        preds_j = jax.nn.softmax(jnp.asarray(b), axis=-1)
        ours = losses.kl_divergence_map(jnp.asarray(a), preds_j)
        np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-3, atol=1e-4)

    def test_mse_target_stopgrad(self, rng):
        a, _ = _rand_logits_labels(rng, b=1, h=4, w=4)
        b, _ = _rand_logits_labels(rng, b=1, h=4, w=4)
        g = jax.grad(
            lambda t: jnp.mean(losses.softmax_mse_loss(jnp.asarray(a), t))
        )(jnp.asarray(b))
        assert float(jnp.abs(g).max()) == 0.0


class TestFocalEntropy:
    def test_focal_matches_torch_recipe(self, rng):
        logits, labels = _rand_logits_labels(rng)
        inp = _to_torch_nchw(logits)
        target = torch.from_numpy(labels).long()
        # reference losses_1.py:74-97 recipe
        x = inp.view(inp.size(0), inp.size(1), -1).transpose(1, 2).contiguous()
        x = x.view(-1, x.size(2))
        t = target.view(-1, 1)
        logpt = F.log_softmax(x, dim=1).gather(1, t).view(-1)
        pt = logpt.data.exp()
        theirs = float((-1 * (1 - pt) ** 2 * logpt).mean())
        ours = losses.focal_loss(jnp.asarray(logits), jnp.asarray(labels), gamma=2.0)
        np.testing.assert_allclose(float(ours), theirs, rtol=1e-4)

    def test_entropy_minimization(self, rng):
        logits, _ = _rand_logits_labels(rng)
        p = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        ours = losses.entropy_minimization(p)
        pt = F.softmax(_to_torch_nchw(logits), dim=1)
        theirs = float(torch.mean(-torch.sum(pt * torch.log(pt + 1e-6), dim=1)))
        np.testing.assert_allclose(float(ours), theirs, rtol=1e-4)


class TestFeatureSim:
    def test_matches_torch_recipe(self, rng):
        f1 = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
        f2 = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
        ours = losses.feature_sim_loss(jnp.asarray(f1), jnp.asarray(f2))
        a = torch.from_numpy(f1).view(4, -1)
        b = torch.from_numpy(f2).view(4, -1)
        ga = F.normalize(a @ a.t(), p=2, dim=1)
        gb = F.normalize(b @ b.t(), p=2, dim=1)
        theirs = float(F.mse_loss(ga, gb))
        np.testing.assert_allclose(float(ours), theirs, rtol=5e-3)
