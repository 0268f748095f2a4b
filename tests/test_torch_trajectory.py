"""Train-TRAJECTORY equivalence vs the actual reference code.

The strongest quality proof available in a data-less environment
(VERDICT r2 #1a): export our init into the real torch ``UNet_UAPS``
(read-only import from /root/reference), then run N steps of the exact
reference recipe (UAPS_train.py:159-287 — CE+Dice supervision over 4
decoders, KL-uncertainty maps, Dirichlet-mixed argmax pseudo-labels,
scalar-gated pseudo-supervision, l_uncert, sigmoid-ramped weights, Adam)
in torch-CPU, and the same N steps through our REAL jitted
``methods.uaps.make_train_step``, from identical init on identical
batches. Stochastic elements are aligned: dropout/perturbations are
disabled on both sides (ConvBlock Dropout p=0; aux decoders fed
unperturbed skips), and the per-step Dirichlet mixing weights are drawn
once on the host and fed to BOTH frameworks (the rebuild's ``mix_w``
batch hook). Everything left is deterministic, so per-step losses must
agree to float32 accumulation noise — each step's loss reflects every
previous step's parameter update, so agreement at step N transitively
pins the whole loss/grad trajectory.

The torch side uses the reference's own components (``UNet_UAPS``,
``pytorch_losses.dice_loss``, ``ramps.sigmoid_rampup``, torch
CrossEntropyLoss / KLDivLoss) with the recipe orchestrated per
UAPS_train.py:194-287.
"""
import dataclasses
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import torch
import torch.nn as nn

sys.path.insert(0, "/root/reference")

from uaps_tpu.methods import base as mbase  # noqa: E402
from uaps_tpu.methods import uaps as uaps_method  # noqa: E402
from uaps_tpu.models.unet import MultiDecoderUNet  # noqa: E402
from uaps_tpu.utils.config import preset  # noqa: E402
from uaps_tpu.utils.torch_import import export_state_dict  # noqa: E402

N_STEPS = 10
BATCH = 4
IMAGE = (64, 64)
N_CLASSES = 4


def _make_batches():
    """Identical per-step batches for both frameworks."""
    rng = np.random.default_rng(2024)
    batches = []
    for _ in range(N_STEPS):
        batches.append({
            "image": rng.standard_normal(
                (BATCH, *IMAGE, 3)).astype(np.float32),
            "label": rng.integers(
                0, N_CLASSES, (BATCH, *IMAGE)).astype(np.int32),
            "uimage": rng.standard_normal(
                (BATCH, *IMAGE, 3)).astype(np.float32),
        })
    mix = np.stack([rng.dirichlet(np.ones(4)) for _ in range(N_STEPS)])
    return batches, mix.astype(np.float32)


def _jax_trajectory(batches, mix):
    """N steps through the real jitted uaps train step, deterministic
    model (no dropout, identity perturbations)."""
    cfg = preset("neu", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    # CPU test: plain XLA path, NHWC everywhere
    cfg.model = dataclasses.replace(cfg.model, conv_backend="xla",
                                    nchw_levels=0)
    model = MultiDecoderUNet(
        num_classes=N_CLASSES, perturbations=("none",) * 3,
        dropout=(0.0,) * 5, conv_backend="xla", nchw_levels=0)
    tx = mbase.make_optimizer(cfg.optim)
    state = mbase.init_model_state(cfg, model, jax.random.key(0), tx)
    step = jax.jit(uaps_method.make_train_step(cfg, model, tx))
    losses, sups, psls, uncs = [], [], [], []
    for t in range(N_STEPS):
        b = batches[t]
        batch = {"image": jnp.asarray(b["image"]),
                 "label": jnp.asarray(b["label"]),
                 "uimage": jnp.asarray(b["uimage"]),
                 "ulabel": jnp.asarray(b["label"]),
                 "mix_w": jnp.asarray(mix[t])}
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
        sups.append(float(metrics["sup_loss"]))
        psls.append(float(metrics["ps_loss"]))
        uncs.append(float(metrics["uncertainty_loss"]))
    return state, np.array(losses), np.array(sups), np.array(psls), \
        np.array(uncs)


def _torch_trajectory(init_params, init_stats, batches, mix):
    """N steps of the reference recipe (UAPS_train.py:159-287) on the
    actual reference model, from the exported init."""
    from utilities.UAPS_unet import UNet_UAPS
    from utilities.pytorch_losses import dice_loss
    from utilities.ramps import sigmoid_rampup

    tm = UNet_UAPS(3, N_CLASSES)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(init_params, init_stats).items()}
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected
    assert all("num_batches_tracked" in m for m in missing)
    # disable ConvBlock dropout (UAPS_unet.py:31-47) — the jax side runs
    # dropout=(0,)*5
    for m in tm.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
    tm.train()

    ce = nn.CrossEntropyLoss()
    kl = nn.KLDivLoss(reduction="none")
    log_sm = nn.LogSoftmax(dim=1)
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)

    def fwd(x):
        # UNet_UAPS.forward with the aux perturbations disabled: every
        # decoder sees the unperturbed skips (UAPS_unet.py:224-233)
        feats = tm.encoder(x)
        return [tm.main_decoder(feats), tm.aux_decoder1(feats),
                tm.aux_decoder2(feats), tm.aux_decoder3(feats)]

    losses, sups, psls, uncs = [], [], [], []
    for t in range(N_STEPS):
        b = batches[t]
        x = torch.from_numpy(b["image"].transpose(0, 3, 1, 2))
        y = torch.from_numpy(b["label"].astype(np.int64))
        xu = torch.from_numpy(b["uimage"].transpose(0, 3, 1, 2))

        outs = fwd(x)                               # :177
        un_outs = fwd(xu)                           # :185
        sup_terms = [0.5 * (ce(o, y) + dice_loss(y.unsqueeze(1), o))
                     for o in outs]                 # :194-218
        supervised = sum(sup_terms) / 4

        soft = [torch.softmax(o, dim=1) for o in un_outs]
        preds = sum(soft) / 4                       # :223
        variances = [kl(log_sm(o), preds).sum(dim=1)
                     for o in un_outs]              # :226-239
        exp_vars = [torch.exp(-v) for v in variances]
        l_uncert = (sum(variances) / 4).mean()      # :241-243

        w = torch.from_numpy(mix[t].astype(np.float64))
        pseudo = torch.argmax(
            sum(wi * s.detach() for wi, s in zip(w, soft)), dim=1)  # :251-255
        ps_terms = [0.5 * (ce(o, pseudo)
                           + dice_loss(pseudo.unsqueeze(1), o))
                    for o in un_outs]               # :259-262
        # scalar-loss x mean-gate quirk (:265-268): ps_d is a scalar, so
        # mean(ps_d * exp_var_d) == ps_d * mean(exp_var_d)
        ps_loss = sum(torch.mean(p * ev)
                      for p, ev in zip(ps_terms, exp_vars)) / 4

        w1 = 0.1 * sigmoid_rampup(t // 80, 200.0)   # :279-280
        w2 = 0.1 * sigmoid_rampup(t // 80, 200.0)
        loss = supervised + w1 * ps_loss + w2 * l_uncert  # :282

        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
        sups.append(float(supervised))
        psls.append(float(ps_loss))
        uncs.append(float(l_uncert))
    return np.array(losses), np.array(sups), np.array(psls), np.array(uncs)


@pytest.mark.slow
def test_uaps_train_trajectory_matches_reference():
    batches, mix = _make_batches()

    cfg = preset("neu", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    cfg.model = dataclasses.replace(cfg.model, conv_backend="xla",
                                    nchw_levels=0)
    model = MultiDecoderUNet(
        num_classes=N_CLASSES, perturbations=("none",) * 3,
        dropout=(0.0,) * 5, conv_backend="xla", nchw_levels=0)
    tx = mbase.make_optimizer(cfg.optim)
    state0 = mbase.init_model_state(cfg, model, jax.random.key(0), tx)
    init_params = jax.tree.map(np.asarray, state0.params)
    init_stats = jax.tree.map(np.asarray, state0.batch_stats)

    _, j_loss, j_sup, j_ps, j_unc = _jax_trajectory(batches, mix)
    t_loss, t_sup, t_ps, t_unc = _torch_trajectory(
        init_params, init_stats, batches, mix)

    print("\nstep |  jax loss  | torch loss |   diff")
    for t in range(N_STEPS):
        print(f"{t:4d} | {j_loss[t]:.6f} | {t_loss[t]:.6f} | "
              f"{j_loss[t] - t_loss[t]:+.2e}")

    # identical recipe + identical init + identical randomness: only
    # f32 accumulation-order noise remains, compounding through N Adam
    # updates. Empirically the divergence stays ~1e-4 by step 10.
    np.testing.assert_allclose(j_loss, t_loss, rtol=0, atol=5e-3)
    np.testing.assert_allclose(j_sup, t_sup, rtol=0, atol=5e-3)
    np.testing.assert_allclose(j_ps, t_ps, rtol=0, atol=5e-3)
    np.testing.assert_allclose(j_unc, t_unc, rtol=0, atol=5e-3)
    # the trajectories must actually MOVE (a frozen model would also
    # "agree"): supervised loss at the end well below the start
    assert t_loss[-1] < t_loss[0]
    assert j_loss[-1] < j_loss[0]
