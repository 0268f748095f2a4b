"""UAMT: uncertainty-aware mean teacher.

Reference: /root/reference/UAMT/UA_MT_train.py:180-215. On top of MT:
  - T=8 stochastic teacher passes on the noised unlabeled batch; predictive
    entropy of the mean softmax is the uncertainty map (:188-200)
  - mask = entropy < (0.75 + 2.5 w(t)) ln 2                   (:211-213)
  - cons = sum(mask * (student_soft - teacher_soft)^2) / (2 sum(mask))
                                                              (:210-214)
  - w(t) ramps on iter//80                                    (:207)

TPU note (SURVEY.md §7 hard part 6): the reference loops T/2 times over a
2x-repeated batch; here the T samples run as ONE batched teacher forward of
shape [T*B, H, W, C] — one XLA program, full MXU utilization.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from uaps_tpu.methods import base
from uaps_tpu.methods.mt import init_state, ema_update, teacher_noise  # noqa: F401
from uaps_tpu.ops import segmentation_metrics


def make_train_step(cfg, model, tx, axis_name=None):
    mcfg = cfg.method
    n_classes = cfg.data.num_classes
    T = mcfg.uamt_num_samples

    def train_step(state: base.TrainState,
                   batch) -> Tuple[base.TrainState, Dict[str, jax.Array]]:
        new_key, d1, d2, n_key, t_noise, t_drop = jax.random.split(
            state.key, 6)
        d1, d2, n_key, t_noise, t_drop = base.device_keys(
            (d1, d2, n_key, t_noise, t_drop), axis_name)
        uimage = batch["uimage"]
        b = uimage.shape[0]

        # teacher pass for the consistency target (same as MT).
        # "tnoise"/"tnoise_T" batch hooks: trajectory tests feed the SAME
        # noise draws to torch and jax (tests/test_torch_trajectory2.py)
        ema_in = (uimage + batch["tnoise"] if "tnoise" in batch
                  else teacher_noise(n_key, uimage))
        ema_logits, new_ema_bs = base.apply_train(
            model, state.ema_params, state.ema_batch_stats, ema_in,
            rngs={"dropout": jax.random.fold_in(t_drop, 0)})
        ema_soft = jax.lax.stop_gradient(jax.nn.softmax(ema_logits, axis=-1))

        # T stochastic passes, batched into one forward [T*B, ...]
        rep = jnp.tile(uimage, (T, 1, 1, 1))
        rep = (rep + batch["tnoise_T"] if "tnoise_T" in batch
               else teacher_noise(t_noise, rep))
        t_logits, _ = base.apply_train(
            model, state.ema_params, state.ema_batch_stats, rep,
            rngs={"dropout": jax.random.fold_in(t_drop, 1)})
        t_soft = jax.nn.softmax(t_logits, axis=-1)
        mean_soft = jnp.mean(
            t_soft.reshape(T, b, *t_soft.shape[1:]), axis=0)
        uncertainty = -jnp.sum(
            mean_soft * jnp.log(mean_soft + 1e-6), axis=-1)  # [B,H,W]
        uncertainty = jax.lax.stop_gradient(uncertainty)

        def loss_fn(params):
            logits, bs1 = base.apply_train(
                model, params, state.batch_stats, batch["image"],
                rngs={"dropout": d1})
            un_logits, bs2 = base.apply_train(
                model, params, bs1, uimage, rngs={"dropout": d2})
            ce, dice = base.supervised_ce_dice(logits, batch["label"],
                                               cfg.model.conv_backend)
            sup = 0.5 * (ce + dice)
            w = base.ramp_weight(mcfg.consistency1, state.step,
                                 mcfg.ramp_iters, mcfg.consistency_rampup)
            dist = (jax.nn.softmax(un_logits, axis=-1) - ema_soft) ** 2
            threshold = (0.75 + 2.5 * w) * jnp.log(2.0)
            mask = (uncertainty < threshold).astype(dist.dtype)[..., None]
            cons = jnp.sum(mask * dist) / (2.0 * jnp.sum(mask) + 1e-16)
            loss = sup + w * cons
            return loss, (logits, bs2, ce, dice, cons, w)

        (loss, (logits, new_bs, ce, dice, cons, w)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = base.pmean_if(grads, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        new_ema = ema_update(new_params, state.ema_params, mcfg.ema_decay,
                             state.step)
        m = segmentation_metrics(logits, batch["label"], n_classes)
        metrics = {"loss": loss, "ce_loss": ce, "dice_loss": dice,
                   "consistency_loss": cons, "consistency_w1": w,
                   "mean_uncertainty": jnp.mean(uncertainty),
                   "train_miou": m["miou"], "train_mdice": m["mdice"]}
        metrics = base.pmean_if(metrics, axis_name)
        return state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=base.pmean_if(new_bs, axis_name),
            opt_state=new_opt, key=new_key, ema_params=new_ema,
            ema_batch_stats=base.pmean_if(new_ema_bs, axis_name)), metrics

    return train_step
