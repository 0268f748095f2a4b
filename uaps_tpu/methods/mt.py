"""Mean Teacher: student/EMA-teacher consistency.

Reference: /root/reference/MT/MT_train.py. Recipe:
  sup     = 0.5 (CE + Dice) on labeled student output       (:189-193)
  teacher input = unlabeled + clamp(N(0, 0.1), -0.2, 0.2)   (:181-182)
  cons    = mean((soft(student(un)) - soft(teacher(un+noise)))^2),
            HARD-GATED to 0 while iter < 1000               (:196-199)
  loss    = sup + w(t) cons, w ramps on iter//150           (:194,202)
  EMA update alpha = min(1 - 1/(step+1), ema_decay)         (:79-83,219)

TPU notes: the teacher runs in train mode like the reference (its BN
normalizes with its own batch statistics and its running stats evolve only
through its own forwards — update_ema_variables touches parameters(), not
buffers). EMA params live in state.ema_params; the teacher path is under
stop_gradient via the loss construction (teacher logits never enter grads).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from uaps_tpu.methods import base
from uaps_tpu.ops import segmentation_metrics


def init_state(cfg, rng) -> Tuple[base.TrainState, object]:
    model = base.build_model(cfg)
    tx = base.make_optimizer(cfg.optim)
    state = base.init_model_state(cfg, model, rng, tx)
    # teacher starts as a copy; alpha=0 at step 0 makes it the student
    # after one update regardless (MT_train.py:81)
    return state.replace(
        ema_params=jax.tree.map(jnp.copy, state.params),
        ema_batch_stats=jax.tree.map(jnp.copy, state.batch_stats),
    ), model


def ema_update(params, ema_params, decay, step):
    alpha = jnp.minimum(1.0 - 1.0 / (step.astype(jnp.float32) + 1.0), decay)
    return jax.tree.map(lambda e, p: alpha * e + (1.0 - alpha) * p,
                        ema_params, params)


def teacher_noise(key, x):
    """clamp(N(0,0.1), +-0.2) input noise (MT_train.py:181)."""
    return x + jnp.clip(
        jax.random.normal(key, x.shape, x.dtype) * 0.1, -0.2, 0.2)


def make_train_step(cfg, model, tx, axis_name=None):
    mcfg = cfg.method
    n_classes = cfg.data.num_classes

    def train_step(state: base.TrainState,
                   batch) -> Tuple[base.TrainState, Dict[str, jax.Array]]:
        new_key, d1, d2, n_key, dt_key = jax.random.split(state.key, 5)
        d1, d2, n_key, dt_key = base.device_keys(
            (d1, d2, n_key, dt_key), axis_name)

        # teacher forward (no grad path; its own stats stream).
        # "tnoise" batch hook: tests feed the SAME noise draw to torch
        # and jax for trajectory equivalence (like uaps's "mix_w")
        if "tnoise" in batch:
            ema_in = batch["uimage"] + batch["tnoise"]
        else:
            ema_in = teacher_noise(n_key, batch["uimage"])
        ema_logits, new_ema_bs = base.apply_train(
            model, state.ema_params, state.ema_batch_stats, ema_in,
            rngs={"dropout": dt_key})
        ema_soft = jax.lax.stop_gradient(jax.nn.softmax(ema_logits, axis=-1))

        def loss_fn(params):
            logits, bs1 = base.apply_train(
                model, params, state.batch_stats, batch["image"],
                rngs={"dropout": d1})
            un_logits, bs2 = base.apply_train(
                model, params, bs1, batch["uimage"], rngs={"dropout": d2})
            ce, dice = base.supervised_ce_dice(logits, batch["label"],
                                               cfg.model.conv_backend)
            sup = 0.5 * (ce + dice)
            cons = jnp.mean(
                (jax.nn.softmax(un_logits, axis=-1) - ema_soft) ** 2)
            # hard gate while iter < consistency_start_iter (:196-199)
            cons = jnp.where(state.step < mcfg.consistency_start_iter,
                             0.0, cons)
            w = base.ramp_weight(mcfg.consistency1, state.step,
                                 150, mcfg.consistency_rampup)
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
                   "train_miou": m["miou"], "train_mdice": m["mdice"]}
        metrics = base.pmean_if(metrics, axis_name)
        return state.replace(
            step=state.step + 1, params=new_params,
            batch_stats=base.pmean_if(new_bs, axis_name),
            opt_state=new_opt, key=new_key, ema_params=new_ema,
            ema_batch_stats=base.pmean_if(new_ema_bs, axis_name)), metrics

    return train_step
