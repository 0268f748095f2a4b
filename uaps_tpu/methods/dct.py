"""DCT: rotation-consistency training on a plain U-Net.

Reference: /root/reference/DCT/DCT_train.py:163-191. Recipe:
  k ~ U{0..3}; cons = mean((soft(f(rot90^k(x_u))) - rot90^k(soft(f(x_u))))^2)
  loss = 0.5(CE+Dice) + w(t) cons, w ramps on iter//150.
Gradients flow through BOTH forwards (no detach in the reference).

The random k is a traced scalar, so the rotation dispatches through
lax.switch over the four static rot90 variants (square inputs; compiler-
friendly control flow instead of data-dependent shapes).
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


def _rot_k(x, k):
    """rot90^k over the spatial axes (1, 2) of NHWC, k traced."""
    return jax.lax.switch(
        k,
        [lambda v: v,
         lambda v: jnp.rot90(v, 1, axes=(1, 2)),
         lambda v: jnp.rot90(v, 2, axes=(1, 2)),
         lambda v: jnp.rot90(v, 3, axes=(1, 2))],
        x)


def make_train_step(cfg, model, tx, axis_name=None):
    mcfg = cfg.method
    n_classes = cfg.data.num_classes

    def train_step(state: base.TrainState,
                   batch) -> Tuple[base.TrainState, Dict[str, jax.Array]]:
        new_key, d1, d2, d3, k_rot = jax.random.split(state.key, 5)
        d1, d2, d3 = base.device_keys((d1, d2, d3), axis_name)
        # rotation count is one global draw per step (reference :173) so
        # k_rot stays shared across devices. "rot_k" batch hook:
        # trajectory tests feed the same k to torch and jax.
        k = (jnp.asarray(batch["rot_k"], jnp.int32) if "rot_k" in batch
             else jax.random.randint(k_rot, (), 0, 4))

        def loss_fn(params):
            logits, bs1 = base.apply_train(
                model, params, state.batch_stats, batch["image"],
                rngs={"dropout": d1})
            un_logits, bs2 = base.apply_train(
                model, params, bs1, batch["uimage"], rngs={"dropout": d2})
            rot_logits, bs3 = base.apply_train(
                model, params, bs2, _rot_k(batch["uimage"], k),
                rngs={"dropout": d3})
            ce, dice = base.supervised_ce_dice(logits, batch["label"],
                                               cfg.model.conv_backend)
            sup = 0.5 * (ce + dice)
            cons = jnp.mean(
                (jax.nn.softmax(rot_logits, axis=-1)
                 - _rot_k(jax.nn.softmax(un_logits, axis=-1), k)) ** 2)
            w = base.ramp_weight(mcfg.consistency1, state.step, 150,
                                 mcfg.consistency_rampup)
            loss = sup + w * cons
            return loss, (logits, bs3, ce, dice, cons, w)

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
