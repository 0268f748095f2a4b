"""CCT: cross-consistency training over the 4-decoder net.

Reference: /root/reference/CCT/CCT_train.py:161-202. Same architecture as
UAPS (UNet_CCT == UNet_UAPS); recipe:
  sup  = (sum of 4 CE + 4 Dice) / 8                          (:191-192)
  cons = mean over aux of mean((main_soft - aux_soft)^2)     (:196-200)
         NOTE: SYMMETRIC — the reference takes no detach, so gradients
         flow into both the main and aux softmaxes.
  loss = sup + w(t) cons, w ramps on iter//150               (:194,202)
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from uaps_tpu.methods import base
from uaps_tpu.ops import segmentation_metrics, cross_entropy_loss, \
    softmax_dice_loss


def init_state(cfg, rng) -> Tuple[base.TrainState, object]:
    model = base.build_model(cfg)
    tx = base.make_optimizer(cfg.optim)
    return base.init_model_state(cfg, model, rng, tx), model


def make_train_step(cfg, model, tx, axis_name=None):
    mcfg = cfg.method
    n_classes = cfg.data.num_classes

    def train_step(state: base.TrainState,
                   batch) -> Tuple[base.TrainState, Dict[str, jax.Array]]:
        new_key, d1, p1, d2, p2 = jax.random.split(state.key, 5)
        d1, p1, d2, p2 = base.device_keys((d1, p1, d2, p2), axis_name)

        fwd = (base.apply_train_stacked if cfg.model.stack_decoders
               else base.apply_train)

        def loss_fn(params):
            outs, bs1 = fwd(
                model, params, state.batch_stats, batch["image"],
                rngs={"dropout": d1, "perturb": p1})
            un_outs, bs2 = fwd(
                model, params, bs1, batch["uimage"],
                rngs={"dropout": d2, "perturb": p2})
            labels = batch["label"]
            pairs = [base.supervised_ce_dice(o, labels,
                                             cfg.model.conv_backend)
                     for o in outs]
            ces = [p[0] for p in pairs]
            dices = [p[1] for p in pairs]
            sup = (sum(ces) + sum(dices)) / (2 * len(outs))
            softs = [jax.nn.softmax(o, axis=-1) for o in un_outs]
            cons = sum(jnp.mean((softs[0] - s) ** 2) for s in softs[1:]) \
                / (len(softs) - 1)
            w = base.ramp_weight(mcfg.consistency1, state.step, 150,
                                 mcfg.consistency_rampup)
            loss = sup + w * cons
            return loss, (outs[0], bs2, sum(ces) / len(ces),
                          sum(dices) / len(dices), cons, w)

        (loss, (logits, new_bs, ce, dice, cons, w)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = base.pmean_if(grads, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        m = segmentation_metrics(logits, batch["label"], n_classes)
        metrics = {"loss": loss, "ce_loss": ce, "dice_loss": dice,
                   "consistency_loss": cons, "consistency_w1": w,
                   "train_miou": m["miou"], "train_mdice": m["mdice"]}
        metrics = base.pmean_if(metrics, axis_name)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=base.pmean_if(new_bs, axis_name),
                             opt_state=new_opt,
                             key=new_key), metrics

    return train_step
