"""CPS: cross pseudo supervision between two independently-initialized nets.

Reference: /root/reference/CPS/CPS_train.py:190-261 with two UNet_f
(deep-supervision decoder, only the full-res dp0 head used — CPS_model.py).
Recipe:
  sup      = 0.5(CE1+Dice1) + 0.5(CE2+Dice2)                 (:215-225)
  labeled_cps: each net supervised by the argmax of the OTHER net's
               (detached) labeled prediction                  (:228-234)
  unl_cps:   same on the unlabeled batch                      (:239-245)
  loss = sup + w(t) unl_cps + w(t) labeled_cps, w on iter//150 (:247-250)
Both nets update with their own Adam on the one combined loss (the cross
terms decouple cleanly because pseudo-labels are stop-gradient'd).

State layout: net 1 in the outer TrainState, net 2 nested in state.second.
The reference's `feature_sim` import is instantiated but unused in the
final loss (SURVEY.md §2.2) — reproduced by NOT including it.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from uaps_tpu.methods import base
from uaps_tpu.ops import cross_entropy_loss, softmax_dice_loss, \
    segmentation_metrics


def init_state(cfg, rng) -> Tuple[base.TrainState, object]:
    model = base.build_model(cfg)
    tx = base.make_optimizer(cfg.optim)
    r1, r2 = jax.random.split(rng)
    s1 = base.init_model_state(cfg, model, r1, tx)
    s2 = base.init_model_state(cfg, model, r2, tx)
    return s1.replace(second=s2), model


def _ps_pair(logits_a, pseudo_b, backend="auto"):
    """0.5 CE(a, pseudo_b) + 0.5 Dice(pseudo_b, a) (:228-245)."""
    ce, dice = base.supervised_ce_dice(logits_a, pseudo_b, backend)
    return 0.5 * ce + 0.5 * dice


def make_train_step(cfg, model, tx, axis_name=None):
    mcfg = cfg.method
    n_classes = cfg.data.num_classes

    def forward(params, batch_stats, x, key):
        out, bs = base.apply_train(model, params, batch_stats, x,
                                   rngs={"dropout": key})
        return out["dp0"], bs

    def train_step(state: base.TrainState,
                   batch) -> Tuple[base.TrainState, Dict[str, jax.Array]]:
        s2 = state.second
        new_key, d1a, d1b, d2a, d2b = jax.random.split(state.key, 5)
        d1a, d1b, d2a, d2b = base.device_keys((d1a, d1b, d2a, d2b),
                                              axis_name)

        def loss_fn(params1, params2):
            o1, bs1a = forward(params1, state.batch_stats,
                               batch["image"], d1a)
            u1, bs1b = forward(params1, bs1a, batch["uimage"], d1b)
            o2, bs2a = forward(params2, s2.batch_stats, batch["image"], d2a)
            u2, bs2b = forward(params2, bs2a, batch["uimage"], d2b)

            labels = batch["label"]
            be = cfg.model.conv_backend
            ce1, dice1 = base.supervised_ce_dice(o1, labels, be)
            ce2, dice2 = base.supervised_ce_dice(o2, labels, be)
            sup = 0.5 * (ce1 + dice1) + 0.5 * (ce2 + dice2)

            pl1 = jnp.argmax(jax.lax.stop_gradient(o1), axis=-1)
            pl2 = jnp.argmax(jax.lax.stop_gradient(o2), axis=-1)
            labeled_cps = _ps_pair(o1, pl2, be) + _ps_pair(o2, pl1, be)

            pu1 = jnp.argmax(jax.lax.stop_gradient(u1), axis=-1)
            pu2 = jnp.argmax(jax.lax.stop_gradient(u2), axis=-1)
            unl_cps = _ps_pair(u1, pu2, be) + _ps_pair(u2, pu1, be)

            w = base.ramp_weight(mcfg.consistency1, state.step, 150,
                                 mcfg.consistency_rampup)
            loss = sup + w * unl_cps + w * labeled_cps
            aux = (o1, bs1b, bs2b, sup, labeled_cps, unl_cps, w)
            return loss, aux

        (loss, (o1, bs1, bs2, sup, lcps, ucps, w)), grads = \
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                state.params, s2.params)
        g1, g2 = grads
        g1 = base.pmean_if(g1, axis_name)
        g2 = base.pmean_if(g2, axis_name)
        up1, opt1 = tx.update(g1, state.opt_state, state.params)
        new_p1 = jax.tree.map(lambda p, u: p + u, state.params, up1)
        up2, opt2 = tx.update(g2, s2.opt_state, s2.params)
        new_p2 = jax.tree.map(lambda p, u: p + u, s2.params, up2)

        m = segmentation_metrics(o1, batch["label"], n_classes)
        metrics = {"loss": loss, "sup_loss": sup,
                   "labeled_cps_loss": lcps, "unlabeled_cps_loss": ucps,
                   "consistency_w1": w,
                   "train_miou": m["miou"], "train_mdice": m["mdice"]}
        metrics = base.pmean_if(metrics, axis_name)
        new_s2 = s2.replace(step=s2.step + 1, params=new_p2,
                            batch_stats=base.pmean_if(bs2, axis_name),
                            opt_state=opt2)
        return state.replace(step=state.step + 1, params=new_p1,
                             batch_stats=base.pmean_if(bs1, axis_name),
                             opt_state=opt1,
                             key=new_key, second=new_s2), metrics

    return train_step
