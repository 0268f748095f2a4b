"""Train-trajectory equivalence vs the reference code — remaining methods.

Round-4 covered UAPS (tests/test_torch_trajectory.py), MT and CPS; this
file closes the set with UAMT, CCT, DCT and UCC, so every method trainer
is pinned by N steps of the ACTUAL reference recipe (read-only import
from /root/reference) run side-by-side with our jitted train step from
identical init on identical batches. Stochastic elements are aligned the
same way as before: dropout/perturbations disabled on both sides, and
every remaining random draw made ONCE on the host and fed to BOTH
frameworks via batch hooks ("tnoise"/"tnoise_T" for UAMT's noised
teacher passes, "rot_k" for DCT's rotation, "mix_*" pre-mixed streams
for UCC — the cutmix ops themselves are pinned separately in
tests/test_cutmix.py-style unit tests).

References exercised:
  UAMT /root/reference/UAMT/UA_MT_train.py:174-240 (T=8 uncertainty
       mask, softmax-MSE consistency, EMA teacher)
  CCT  /root/reference/CCT/CCT_train.py:161-211 (4-decoder sup/8,
       symmetric MSE to the main head)
  DCT  /root/reference/DCT/DCT_train.py:163-196 (rot90 consistency)
  UCC  /root/reference/UCC/UCC_train.py:143-249 (cross-head KL
       uncertainty, argmax pseudo-labels, scalar-gate quirk)
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
from uaps_tpu.utils.config import preset  # noqa: E402
from uaps_tpu.utils.torch_import import export_state_dict  # noqa: E402

N_STEPS = 10
BATCH = 4
IMAGE = (64, 64)
N_CLASSES = 4


def _load_ref(tm, params, stats, allow_missing=()):
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, stats).items()}
    missing, unexpected = tm.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all(("num_batches_tracked" in m)
               or any(a in m for a in allow_missing)
               for m in missing), missing
    for mod in tm.modules():
        if isinstance(mod, nn.Dropout):
            mod.p = 0.0
    tm.train()
    return tm


def _np_state(state):
    return (jax.tree.map(np.asarray, state.params),
            jax.tree.map(np.asarray, state.batch_stats))


def _print_table(j_loss, t_loss):
    print("\nstep |  jax loss  | torch loss |   diff")
    for t in range(N_STEPS):
        print(f"{t:4d} | {j_loss[t]:.6f} | {t_loss[t]:.6f} | "
              f"{j_loss[t] - t_loss[t]:+.2e}")


# ---------------------------------------------------------------------------
# baseline — baseline/baseline_train.py:158-176: fully-supervised
# 0.5*(CE+Dice) + Adam on the plain UNet. Fully deterministic with
# dropout off; completes 8/8 method-trajectory coverage.
# ---------------------------------------------------------------------------

def _baseline_cfg():
    cfg = preset("neu", method="baseline")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    cfg.model = dataclasses.replace(cfg.model, name="unet",
                                    conv_backend="xla", nchw_levels=0)
    return cfg


@pytest.mark.slow
def test_baseline_train_trajectory_matches_reference():
    from uaps_tpu.methods import baseline as baseline_method
    from uaps_tpu.models.unet import UNet
    from utilities.baseline_unet import UNet as TorchUNet
    from utilities.pytorch_losses import dice_loss

    batches = _make_plain_batches(112)
    cfg = _baseline_cfg()
    model = UNet(num_classes=N_CLASSES, dropout=(0.0,) * 5,
                 conv_backend="xla", nchw_levels=0)
    tx = mbase.make_optimizer(cfg.optim)
    state = mbase.init_model_state(cfg, model, jax.random.key(0), tx)
    init_params, init_stats = _np_state(state)
    step = jax.jit(baseline_method.make_train_step(cfg, model, tx))
    j_loss = []
    for b in batches:
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        state, m = step(state, batch)
        j_loss.append(float(m["loss"]))
    j_loss = np.array(j_loss)

    tm = _load_ref(TorchUNet(3, N_CLASSES), init_params, init_stats)
    ce = nn.CrossEntropyLoss()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)
    t_loss = []
    for b in batches:
        x = torch.from_numpy(b["image"].transpose(0, 3, 1, 2))
        y = torch.from_numpy(b["label"].astype(np.int64))
        out = tm(x)                                       # :158
        loss = 0.5 * (dice_loss(y.unsqueeze(1), out)
                      + ce(out, y))                       # :161-164
        opt.zero_grad()
        loss.backward()
        opt.step()
        t_loss.append(float(loss))
    t_loss = np.array(t_loss)

    _print_table(j_loss, t_loss)
    np.testing.assert_allclose(j_loss, t_loss, rtol=0, atol=5e-3)
    assert t_loss[-1] < t_loss[0] and j_loss[-1] < j_loss[0]


# ---------------------------------------------------------------------------
# UAMT — UA_MT_train.py:174-240. T=8 noised teacher passes feed a
# predictive-entropy mask over the softmax-MSE consistency; EMA teacher
# with alpha = min(1-1/(step+1), decay) after the optimizer step.
# ---------------------------------------------------------------------------

T_SAMPLES = 8


def _make_uamt_batches():
    rng = np.random.default_rng(4242)
    batches = []
    for _ in range(N_STEPS):
        batches.append({
            "image": rng.standard_normal(
                (BATCH, *IMAGE, 3)).astype(np.float32),
            "label": rng.integers(
                0, N_CLASSES, (BATCH, *IMAGE)).astype(np.int32),
            "uimage": rng.standard_normal(
                (BATCH, *IMAGE, 3)).astype(np.float32),
            # clamped noise for the teacher consistency pass (:181) and
            # the T stochastic passes (:195), drawn once, fed to both
            "tnoise": np.clip(rng.standard_normal(
                (BATCH, *IMAGE, 3)) * 0.1, -0.2, 0.2).astype(np.float32),
            "tnoise_T": np.clip(rng.standard_normal(
                (T_SAMPLES * BATCH, *IMAGE, 3)) * 0.1,
                -0.2, 0.2).astype(np.float32),
        })
    return batches


def _uamt_cfg():
    cfg = preset("neu", method="uamt")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    cfg.model = dataclasses.replace(cfg.model, name="unet",
                                    conv_backend="xla", nchw_levels=0)
    cfg.method = dataclasses.replace(
        cfg.method, consistency1=0.1, consistency_rampup=200.0,
        ema_decay=0.99, uamt_num_samples=T_SAMPLES)
    return cfg


def _jax_uamt_trajectory(batches):
    from uaps_tpu.methods import uamt as uamt_method
    from uaps_tpu.models.unet import UNet

    cfg = _uamt_cfg()
    model = UNet(num_classes=N_CLASSES, dropout=(0.0,) * 5,
                 conv_backend="xla", nchw_levels=0)
    tx = mbase.make_optimizer(cfg.optim)
    state = mbase.init_model_state(cfg, model, jax.random.key(0), tx)
    state = state.replace(
        ema_params=jax.tree.map(jnp.copy, state.params),
        ema_batch_stats=jax.tree.map(jnp.copy, state.batch_stats))
    init = _np_state(state)
    step = jax.jit(uamt_method.make_train_step(cfg, model, tx))
    losses, ces, cons = [], [], []
    for b in batches:
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        batch["ulabel"] = batch["label"]
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        ces.append(float(m["ce_loss"]))
        cons.append(float(m["consistency_loss"]))
    return init, np.array(losses), np.array(ces), np.array(cons)


def _torch_uamt_trajectory(init_params, init_stats, batches):
    """UA_MT_train.py:174-240 on the reference baseline UNet; teacher
    initialized to the student (matching our EMA-copy start — the
    reference's independently-random teacher start only affects the
    pre-first-update teacher output, same note as the MT test)."""
    import torch.nn.functional as F
    from utilities.baseline_unet import UNet as TorchUNet
    from utilities.pytorch_losses import dice_loss
    from utilities.ramps import sigmoid_rampup

    student = _load_ref(TorchUNet(3, N_CLASSES), init_params, init_stats)
    teacher = _load_ref(TorchUNet(3, N_CLASSES), init_params, init_stats)
    for p in teacher.parameters():
        p.detach_()                           # UA_MT_model.py:13-15

    ce = nn.CrossEntropyLoss()
    opt = torch.optim.Adam(student.parameters(), lr=1e-3)

    losses, ces, cons_l = [], [], []
    for t, b in enumerate(batches):
        x = torch.from_numpy(b["image"].transpose(0, 3, 1, 2))
        y = torch.from_numpy(b["label"].astype(np.int64))
        xu = torch.from_numpy(b["uimage"].transpose(0, 3, 1, 2))
        noise = torch.from_numpy(b["tnoise"].transpose(0, 3, 1, 2))
        noise_T = torch.from_numpy(b["tnoise_T"].transpose(0, 3, 1, 2))

        out = student(x)                                  # :174
        un_out = student(xu)                              # :177
        with torch.no_grad():
            ema_out = teacher(xu + noise)                 # :181-186

        # T stochastic teacher passes on the 2x-repeated batch (:188-202)
        u_r = xu.repeat(2, 1, 1, 1)
        stride = u_r.shape[0] // 2
        preds = torch.zeros([stride * T_SAMPLES, N_CLASSES, *IMAGE])
        for i in range(T_SAMPLES // 2):
            ni = noise_T[2 * stride * i:2 * stride * (i + 1)]
            with torch.no_grad():
                preds[2 * stride * i:2 * stride * (i + 1)] = \
                    teacher(u_r + ni)
        preds = F.softmax(preds, dim=1)
        preds = preds.reshape(T_SAMPLES, stride, N_CLASSES, *IMAGE)
        preds = torch.mean(preds, dim=0)
        uncertainty = -1.0 * torch.sum(
            preds * torch.log(preds + 1e-6), dim=1, keepdim=True)  # :202

        loss_ce = ce(out, y)
        loss_dice = dice_loss(y.unsqueeze(1), out)
        sup = 0.5 * (loss_dice + loss_ce)                 # :207
        w = 0.1 * sigmoid_rampup(t // 80, 200.0)          # :207
        dist = (torch.softmax(un_out, dim=1)
                - torch.softmax(ema_out, dim=1)) ** 2     # :210
        threshold = (0.75 + 2.5 * w) * np.log(2)          # :212
        mask = (uncertainty < threshold).float()
        cons = torch.sum(mask * dist) / (2 * torch.sum(mask) + 1e-16)
        loss = sup + w * cons                             # :215

        opt.zero_grad()
        loss.backward()
        opt.step()
        alpha = min(1 - 1 / (t + 1), 0.99)                # :79-83,233
        with torch.no_grad():
            for ep, p in zip(teacher.parameters(), student.parameters()):
                ep.data.mul_(alpha).add_(p.data, alpha=1 - alpha)
        losses.append(float(loss))
        ces.append(float(loss_ce))
        cons_l.append(float(cons))
    return np.array(losses), np.array(ces), np.array(cons_l)


@pytest.mark.slow
def test_uamt_train_trajectory_matches_reference():
    batches = _make_uamt_batches()
    (init_params, init_stats), j_loss, j_ce, j_cons = \
        _jax_uamt_trajectory(batches)
    t_loss, t_ce, t_cons = _torch_uamt_trajectory(
        init_params, init_stats, batches)
    _print_table(j_loss, t_loss)
    np.testing.assert_allclose(j_loss, t_loss, rtol=0, atol=5e-3)
    # the T=8-sample entropy mask is a HARD threshold: near-threshold
    # pixels flip under f32 op-order drift, nudging the gradient and
    # compounding through Adam (measured: exact at step 0, ~5e-3 abs on
    # the ce sequence by step 9 — same class of discrete drift as the
    # CPS argmax note). Strict atol early pins the semantics; the tail
    # gets a relative band.
    np.testing.assert_allclose(j_ce[:5], t_ce[:5], rtol=0, atol=5e-3)
    np.testing.assert_allclose(j_cons[:5], t_cons[:5], rtol=0, atol=5e-3)
    np.testing.assert_allclose(j_ce, t_ce, rtol=6e-3)
    np.testing.assert_allclose(j_cons, t_cons, rtol=2e-2, atol=1e-3)
    assert t_loss[-1] < t_loss[0] and j_loss[-1] < j_loss[0]


# ---------------------------------------------------------------------------
# CCT — CCT_train.py:161-211. With the aux-feature perturbations
# disabled on both sides the recipe is fully deterministic.
# ---------------------------------------------------------------------------

def _make_plain_batches(seed):
    rng = np.random.default_rng(seed)
    return [{
        "image": rng.standard_normal(
            (BATCH, *IMAGE, 3)).astype(np.float32),
        "label": rng.integers(
            0, N_CLASSES, (BATCH, *IMAGE)).astype(np.int32),
        "uimage": rng.standard_normal(
            (BATCH, *IMAGE, 3)).astype(np.float32),
    } for _ in range(N_STEPS)]


def _cct_cfg():
    cfg = preset("neu", method="cct")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    cfg.model = dataclasses.replace(cfg.model, conv_backend="xla",
                                    nchw_levels=0)
    cfg.method = dataclasses.replace(
        cfg.method, consistency1=0.1, consistency_rampup=200.0)
    return cfg


def _jax_cct_trajectory(batches):
    from uaps_tpu.methods import cct as cct_method
    from uaps_tpu.models.unet import MultiDecoderUNet

    cfg = _cct_cfg()
    model = MultiDecoderUNet(
        num_classes=N_CLASSES, perturbations=("none",) * 3,
        dropout=(0.0,) * 5, conv_backend="xla", nchw_levels=0)
    tx = mbase.make_optimizer(cfg.optim)
    state = mbase.init_model_state(cfg, model, jax.random.key(0), tx)
    init = _np_state(state)
    step = jax.jit(cct_method.make_train_step(cfg, model, tx))
    losses, cons = [], []
    for b in batches:
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        batch["ulabel"] = batch["label"]
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        cons.append(float(m["consistency_loss"]))
    return init, np.array(losses), np.array(cons)


def _torch_cct_trajectory(init_params, init_stats, batches):
    """CCT_train.py:161-211 on the reference UNet_CCT (== UNet_UAPS
    architecture), aux perturbations bypassed like the UAPS harness."""
    from CCT.CCT_unet import UNet_CCT
    from utilities.pytorch_losses import dice_loss
    from utilities.ramps import sigmoid_rampup

    tm = _load_ref(UNet_CCT(3, N_CLASSES), init_params, init_stats)
    ce = nn.CrossEntropyLoss()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)

    def fwd(x):
        feats = tm.encoder(x)
        return [tm.main_decoder(feats), tm.aux_decoder1(feats),
                tm.aux_decoder2(feats), tm.aux_decoder3(feats)]

    losses, cons_l = [], []
    for t, b in enumerate(batches):
        x = torch.from_numpy(b["image"].transpose(0, 3, 1, 2))
        y = torch.from_numpy(b["label"].astype(np.int64))
        xu = torch.from_numpy(b["uimage"].transpose(0, 3, 1, 2))

        outs = fwd(x)                                     # :163
        un_outs = fwd(xu)                                 # :170
        sup = (sum(ce(o, y) for o in outs)
               + sum(dice_loss(y.unsqueeze(1), o)
                     for o in outs)) / 8                  # :191-192
        w = 0.1 * sigmoid_rampup(t // 150, 200.0)         # :194
        soft = [torch.softmax(o, dim=1) for o in un_outs]
        cons = sum(torch.mean((soft[0] - s) ** 2)
                   for s in soft[1:]) / 3                 # :196-200
        loss = sup + w * cons                             # :202
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
        cons_l.append(float(cons))
    return np.array(losses), np.array(cons_l)


@pytest.mark.slow
def test_cct_train_trajectory_matches_reference():
    batches = _make_plain_batches(909)
    (init_params, init_stats), j_loss, j_cons = _jax_cct_trajectory(batches)
    t_loss, t_cons = _torch_cct_trajectory(init_params, init_stats, batches)
    _print_table(j_loss, t_loss)
    np.testing.assert_allclose(j_loss, t_loss, rtol=0, atol=5e-3)
    np.testing.assert_allclose(j_cons, t_cons, rtol=0, atol=5e-3)
    assert t_loss[-1] < t_loss[0] and j_loss[-1] < j_loss[0]


# ---------------------------------------------------------------------------
# DCT — DCT_train.py:163-196. The per-step rotation count is host-drawn
# and fed to both sides via the "rot_k" hook.
# ---------------------------------------------------------------------------

def _dct_cfg():
    cfg = preset("neu", method="dct")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    cfg.model = dataclasses.replace(cfg.model, name="unet",
                                    conv_backend="xla", nchw_levels=0)
    cfg.method = dataclasses.replace(
        cfg.method, consistency1=0.1, consistency_rampup=200.0)
    return cfg


def _jax_dct_trajectory(batches, rot_ks):
    from uaps_tpu.methods import dct as dct_method
    from uaps_tpu.models.unet import UNet

    cfg = _dct_cfg()
    model = UNet(num_classes=N_CLASSES, dropout=(0.0,) * 5,
                 conv_backend="xla", nchw_levels=0)
    tx = mbase.make_optimizer(cfg.optim)
    state = mbase.init_model_state(cfg, model, jax.random.key(0), tx)
    init = _np_state(state)
    step = jax.jit(dct_method.make_train_step(cfg, model, tx))
    losses, cons = [], []
    for b, k in zip(batches, rot_ks):
        batch = {kk: jnp.asarray(v) for kk, v in b.items()}
        batch["ulabel"] = batch["label"]
        batch["rot_k"] = jnp.asarray(k, jnp.int32)
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        cons.append(float(m["consistency_loss"]))
    return init, np.array(losses), np.array(cons)


def _torch_dct_trajectory(init_params, init_stats, batches, rot_ks):
    """DCT_train.py:163-196 on the reference baseline UNet."""
    from utilities.baseline_unet import UNet as TorchUNet
    from utilities.pytorch_losses import dice_loss
    from utilities.ramps import sigmoid_rampup

    tm = _load_ref(TorchUNet(3, N_CLASSES), init_params, init_stats)
    ce = nn.CrossEntropyLoss()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)

    losses, cons_l = [], []
    for t, (b, k) in enumerate(zip(batches, rot_ks)):
        x = torch.from_numpy(b["image"].transpose(0, 3, 1, 2))
        y = torch.from_numpy(b["label"].astype(np.int64))
        xu = torch.from_numpy(b["uimage"].transpose(0, 3, 1, 2))

        out = tm(x)                                       # :165
        un_out = tm(xu)                                   # :170
        rot_out = tm(torch.rot90(xu, k, [2, 3]))          # :173-175
        sup = 0.5 * (ce(out, y)
                     + dice_loss(y.unsqueeze(1), out))    # :179-184
        w = 0.1 * sigmoid_rampup(t // 150, 200.0)         # :186
        cons = torch.mean(
            (torch.softmax(rot_out, dim=1)
             - torch.rot90(torch.softmax(un_out, dim=1),
                           k, [2, 3])) ** 2)              # :188
        loss = sup + w * cons                             # :191
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
        cons_l.append(float(cons))
    return np.array(losses), np.array(cons_l)


@pytest.mark.slow
def test_dct_train_trajectory_matches_reference():
    batches = _make_plain_batches(313)
    rot_ks = np.random.default_rng(7).integers(0, 4, N_STEPS)
    (init_params, init_stats), j_loss, j_cons = \
        _jax_dct_trajectory(batches, rot_ks)
    t_loss, t_cons = _torch_dct_trajectory(
        init_params, init_stats, batches, rot_ks)
    _print_table(j_loss, t_loss)
    np.testing.assert_allclose(j_loss, t_loss, rtol=0, atol=5e-3)
    np.testing.assert_allclose(j_cons, t_cons, rtol=0, atol=5e-3)
    assert t_loss[-1] < t_loss[0] and j_loss[-1] < j_loss[0]


# ---------------------------------------------------------------------------
# UCC — UCC_train.py:143-249. The cutmix streams are pre-mixed on the
# host (the cutmix ops have their own parity tests) and fed identically
# to both sides via the "mix_*" hooks; the FeatureNoise aux perturbation
# is disabled on both sides. The strong stream is the weak stream plus
# noise so the argmax pseudo-labels carry real cross-head signal.
# ---------------------------------------------------------------------------

def _make_ucc_batches():
    rng = np.random.default_rng(616)
    batches = []
    for _ in range(N_STEPS):
        wk = rng.standard_normal((BATCH, *IMAGE, 3)).astype(np.float32)
        batches.append({
            "mix_img_l": rng.standard_normal(
                (BATCH, *IMAGE, 3)).astype(np.float32),
            "mix_lab_l": rng.integers(
                0, N_CLASSES, (BATCH, *IMAGE)).astype(np.int32),
            "mix_wk": wk,
            "mix_st": (wk + 0.3 * rng.standard_normal(
                wk.shape)).astype(np.float32),
        })
    return batches


def _ucc_cfg():
    cfg = preset("neu", method="ucc")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    cfg.model = dataclasses.replace(cfg.model, conv_backend="xla",
                                    nchw_levels=0)
    cfg.method = dataclasses.replace(
        cfg.method, consistency1=0.1, consistency_rampup=200.0)
    return cfg


def _jax_ucc_trajectory(batches):
    from uaps_tpu.methods import ucc as ucc_method
    from uaps_tpu.models.unet import MultiDecoderUNet

    cfg = _ucc_cfg()
    model = MultiDecoderUNet(
        num_classes=N_CLASSES, perturbations=("none",),
        dropout=(0.0,) * 5, conv_backend="xla", nchw_levels=0)
    tx = mbase.make_optimizer(cfg.optim)
    state = mbase.init_model_state(cfg, model, jax.random.key(0), tx)
    init = _np_state(state)
    step = jax.jit(ucc_method.make_train_step(cfg, model, tx))
    losses, sups, psls = [], [], []
    for b in batches:
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
        sups.append(float(m["sup_loss"]))
        psls.append(float(m["ps_loss"]))
    return init, np.array(losses), np.array(sups), np.array(psls)


def _torch_ucc_trajectory(init_params, init_stats, batches):
    """UCC_train.py:168-249 on the reference UNet_UCC, FeatureNoise
    bypassed (encoder + decoders called directly)."""
    from UCC.UCC_unet import UNet_UCC
    from utilities.pytorch_losses import dice_loss
    from utilities.ramps import sigmoid_rampup

    tm = _load_ref(UNet_UCC(3, N_CLASSES), init_params, init_stats)
    ce = nn.CrossEntropyLoss()
    kl = nn.KLDivLoss(reduction="none")
    log_sm = nn.LogSoftmax(dim=1)
    opt = torch.optim.Adam(tm.parameters(), lr=1e-3)

    def fwd(x):
        feats = tm.encoder(x)
        return tm.main_decoder(feats), tm.aux_decoder1(feats)

    losses, sups, psls = [], [], []
    for t, b in enumerate(batches):
        xl = torch.from_numpy(b["mix_img_l"].transpose(0, 3, 1, 2))
        yl = torch.from_numpy(b["mix_lab_l"].astype(np.int64))
        xw = torch.from_numpy(b["mix_wk"].transpose(0, 3, 1, 2))
        xs = torch.from_numpy(b["mix_st"].transpose(0, 3, 1, 2))

        o1, o2 = fwd(xl)                                  # :168
        u1_wk, u2_wk = fwd(xw)                            # :176
        u1_st, u2_st = fwd(xs)                            # :181
        sup = (0.5 * (ce(o1, yl) + dice_loss(yl.unsqueeze(1), o1))
               + 0.5 * (ce(o2, yl)
                        + dice_loss(yl.unsqueeze(1), o2)))  # :186-203

        s1_wk = torch.softmax(u1_wk, dim=1)
        s2_wk = torch.softmax(u2_wk, dim=1)
        s2_st = torch.softmax(u2_st, dim=1)
        var_1 = torch.sum(kl(log_sm(u1_wk), s2_st), dim=1)  # :215
        var_2 = torch.sum(kl(log_sm(u1_st), s2_wk), dim=1)  # :218

        pseudo_1 = torch.argmax(s2_wk.detach(), dim=1)    # :227
        pseudo_2 = torch.argmax(s1_wk.detach(), dim=1)    # :228
        ps_1 = torch.mean(
            0.5 * (ce(u1_st, pseudo_1)
                   + dice_loss(pseudo_1.unsqueeze(1), u1_st))
            * torch.exp(-var_1)) + torch.mean(var_1)      # :236
        ps_2 = torch.mean(
            0.5 * (ce(u2_st, pseudo_2)
                   + dice_loss(pseudo_2.unsqueeze(1), u2_st))
            * torch.exp(-var_2)) + torch.mean(var_2)      # :237
        ps_loss = ps_1 + ps_2

        w = 0.1 * sigmoid_rampup(t // 150, 200.0)         # :243
        loss = sup + w * ps_loss                          # :245
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss))
        sups.append(float(sup))
        psls.append(float(ps_loss))
    return np.array(losses), np.array(sups), np.array(psls)


@pytest.mark.slow
def test_ucc_train_trajectory_matches_reference():
    batches = _make_ucc_batches()
    (init_params, init_stats), j_loss, j_sup, j_ps = \
        _jax_ucc_trajectory(batches)
    t_loss, t_sup, t_ps = _torch_ucc_trajectory(
        init_params, init_stats, batches)
    _print_table(j_loss, t_loss)
    np.testing.assert_allclose(j_loss, t_loss, rtol=0, atol=5e-3)
    np.testing.assert_allclose(j_sup, t_sup, rtol=0, atol=5e-3)
    # argmax pseudo-labels of a nearly-untrained net flip under f32
    # op-order drift (same note as the CPS test): strict atol early,
    # relative band on the tail
    np.testing.assert_allclose(j_ps[:5], t_ps[:5], rtol=0, atol=5e-3)
    np.testing.assert_allclose(j_ps, t_ps, rtol=6e-3)
    assert t_loss[-1] < t_loss[0] and j_loss[-1] < j_loss[0]
