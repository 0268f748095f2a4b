"""Fully-supervised baseline: loss = 0.5 (CE + Dice) on labeled data only.

Reference: /root/reference/baseline/baseline_train.py:143-164 (the minimum
end-to-end slice, SURVEY.md §3.5). One jitted step: forward, loss, grads,
Adam update, on-device metrics.
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
    return base.init_model_state(cfg, model, rng, tx), model


def make_train_step(cfg, model, tx, axis_name=None):
    n_classes = cfg.data.num_classes

    def train_step(state: base.TrainState,
                   batch) -> Tuple[base.TrainState, Dict[str, jax.Array]]:
        new_key, d_key = jax.random.split(state.key)
        (d_key,) = base.device_keys((d_key,), axis_name)

        def loss_fn(params):
            logits, new_bs = base.apply_train(
                model, params, state.batch_stats, batch["image"],
                rngs={"dropout": d_key})
            ce, dice = base.supervised_ce_dice(logits, batch["label"],
                                               cfg.model.conv_backend)
            loss = 0.5 * (ce + dice)
            return loss, (logits, new_bs, ce, dice)

        (loss, (logits, new_bs, ce, dice)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = base.pmean_if(grads, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        m = segmentation_metrics(logits, batch["label"], n_classes)
        metrics = {"loss": loss, "ce_loss": ce, "dice_loss": dice,
                   "train_miou": m["miou"], "train_mdice": m["mdice"]}
        metrics = base.pmean_if(metrics, axis_name)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=base.pmean_if(new_bs, axis_name),
                             opt_state=new_opt,
                             key=new_key), metrics

    return train_step
