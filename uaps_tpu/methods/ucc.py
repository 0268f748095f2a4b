"""UCC: uncertainty-aware cross-head cross-augmentation with CutMix.

Reference: /root/reference/UCC/UCC_train.py:143-246 with UNet_UCC (main +
FeatureNoise aux head) and cross_cutmix.py ops. Recipe:
  data: labeled batch CutMix within-batch (p=.2); labeled content cross-
        CutMixed into weak & strong unlabeled streams (p=.3, shared mask)
        — here done ON DEVICE inside the jitted step (ops/cutmix.py)
  sup   = 0.5(CE+Dice)(head1) + 0.5(CE+Dice)(head2) on mixed labeled
  var_1 = sum_c KL(soft(un2_st) || soft(un1_wk));  var_2 mirrored
          (cross-head AND cross-augmentation, :213-219)
  pseudo_1 = argmax soft(un2_wk).detach; pseudo_2 = argmax soft(un1_wk)
  ps_i  = mean(0.5(CE+Dice)(un_i_st, pseudo_i) * exp(-var_i)) + mean(var_i)
          (scalar-loss x mean-gate, same quirk as UAPS, :235-236)
  loss  = sup + w(t)(ps_1 + ps_2), w ramps on iter//150.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from uaps_tpu.methods import base
from uaps_tpu.ops import (cross_entropy_loss, softmax_dice_loss,
                          kl_divergence_map, segmentation_metrics)
from uaps_tpu.ops.cutmix import generate_mix_data, generate_crossmix_data


def init_state(cfg, rng) -> Tuple[base.TrainState, object]:
    model = base.build_model(cfg)
    tx = base.make_optimizer(cfg.optim)
    return base.init_model_state(cfg, model, rng, tx), model


def make_train_step(cfg, model, tx, axis_name=None):
    mcfg = cfg.method
    n_classes = cfg.data.num_classes

    def train_step(state: base.TrainState,
                   batch) -> Tuple[base.TrainState, Dict[str, jax.Array]]:
        (new_key, k_mix, k_cross, d1, p1, d2, p2, d3, p3
         ) = jax.random.split(state.key, 9)
        (k_mix, k_cross, d1, p1, d2, p2, d3, p3) = base.device_keys(
            (k_mix, k_cross, d1, p1, d2, p2, d3, p3), axis_name)

        # device-side CutMix augmentation (reference does this on host).
        # "mix_*" batch hooks: trajectory tests feed identical pre-mixed
        # streams to torch and jax (the cutmix ops have their own parity
        # tests) — tests/test_torch_trajectory2.py.
        if "mix_img_l" in batch:
            img_l, lab_l = batch["mix_img_l"], batch["mix_lab_l"]
            wk, st = batch["mix_wk"], batch["mix_st"]
        else:
            img_l, lab_l = generate_mix_data(k_mix, batch["image"],
                                             batch["label"], p=0.2)
            wk, st = generate_crossmix_data(
                k_cross, img_l, batch["uimage"], batch["uimage_strong"],
                p=0.3)

        def loss_fn(params):
            (o1, o2), bs1 = base.apply_train(
                model, params, state.batch_stats, img_l,
                rngs={"dropout": d1, "perturb": p1})
            (u1_wk, u2_wk), bs2 = base.apply_train(
                model, params, bs1, wk, rngs={"dropout": d2, "perturb": p2})
            (u1_st, u2_st), bs3 = base.apply_train(
                model, params, bs2, st, rngs={"dropout": d3, "perturb": p3})

            be = cfg.model.conv_backend
            ce1, dice1 = base.supervised_ce_dice(o1, lab_l, be)
            ce2, dice2 = base.supervised_ce_dice(o2, lab_l, be)
            sup = 0.5 * (ce1 + dice1) + 0.5 * (ce2 + dice2)

            s1_wk = jax.nn.softmax(u1_wk, axis=-1)
            s2_wk = jax.nn.softmax(u2_wk, axis=-1)
            s2_st = jax.nn.softmax(u2_st, axis=-1)
            var_1 = kl_divergence_map(u1_wk, s2_st)
            var_2 = kl_divergence_map(u1_st, s2_wk)

            pseudo_1 = jnp.argmax(jax.lax.stop_gradient(s2_wk), axis=-1)
            pseudo_2 = jnp.argmax(jax.lax.stop_gradient(s1_wk), axis=-1)

            ce1u, dice1u = base.supervised_ce_dice(u1_st, pseudo_1, be)
            ce2u, dice2u = base.supervised_ce_dice(u2_st, pseudo_2, be)
            ps_1 = (0.5 * (ce1u + dice1u)
                    * jnp.mean(jnp.exp(-var_1))) + jnp.mean(var_1)
            ps_2 = (0.5 * (ce2u + dice2u)
                    * jnp.mean(jnp.exp(-var_2))) + jnp.mean(var_2)
            ps_loss = ps_1 + ps_2

            w = base.ramp_weight(mcfg.consistency1, state.step, 150,
                                 mcfg.consistency_rampup)
            loss = sup + w * ps_loss
            return loss, (o1, bs3, sup, ps_loss, w,
                          (ce1 + ce2) / 2, (dice1 + dice2) / 2)

        (loss, (o1, new_bs, sup, ps_loss, w, ce, dice)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        grads = base.pmean_if(grads, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        m = segmentation_metrics(o1, lab_l, n_classes)
        metrics = {"loss": loss, "sup_loss": sup, "ps_loss": ps_loss,
                   "ce_loss": ce, "dice_loss": dice, "consistency_w1": w,
                   "train_miou": m["miou"], "train_mdice": m["mdice"]}
        metrics = base.pmean_if(metrics, axis_name)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=base.pmean_if(new_bs, axis_name),
                             opt_state=new_opt,
                             key=new_key), metrics

    return train_step
