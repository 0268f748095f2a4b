"""UAPS: uncertainty-aware, dynamically-mixed pseudo-label training.

Reference: /root/reference/UAPS_train.py:159-287. The whole algorithm —
two forwards (labeled + unlabeled) through the shared-encoder 4-decoder
U-Net, CE+Dice supervision on every decoder, KL-uncertainty maps vs the
averaged prediction, Dirichlet-mixed argmax pseudo-labels, uncertainty-
gated pseudo-supervision, uncertainty-minimization, sigmoid-ramped weights,
Adam update — is ONE jitted XLA program. All five RNG streams of the
reference (torch dropout, torch uniform, numpy threshold, numpy dirichlet)
become splits of `state.key`.

Loss recipe (faithful to the reference, including its quirks):
  sup      = mean_d 0.5 (CE_d + Dice_d)                      (:194-218)
  preds    = mean_d softmax(un_logits_d)                     (:223)
  var_d    = sum_c KL(preds || softmax(un_logits_d))         (:226-239)
  l_uncert = mean(mean_d var_d)                              (:241-243)
  w        ~ Dirichlet(1,1,1,1)  (one draw per step, shared) (:251)
  pseudo   = argmax(sum_d w_d stopgrad(softmax(un_logits_d)))(:252-255)
  ps_d     = 0.5 (CE(un_d, pseudo) + Dice(pseudo, un_d))     (:259-262)
  ps_loss  = mean_d [ ps_d * mean(exp(-var_d)) ]             (:265-277)
             NOTE: ps_d is a SCALAR in the reference, so the "per-pixel"
             uncertainty gate is really scalar-loss x mean-gate; we
             reproduce that exactly.
  loss     = sup + w1(t) ps_loss + w2(t) l_uncert            (:279-282)
with w_i(t) = consistency_i * sigmoid_rampup(step // 80, rampup)
(:81-87,279-280).

Ablation flags (paper/commented code): dynamic_mixing=False averages
instead of Dirichlet mixing (:247); uncertainty_gate=False drops the
exp(-var) gates (:272-275); MTiles extras decoder_consistency_weight and
unramped_uncertainty (MTiles-Dataset-codes/UAPS_train.py:229-239,287).
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from uaps_tpu.methods import base
from uaps_tpu.ops import (
    cross_entropy_loss,
    softmax_dice_loss,
    kl_divergence_map,
    segmentation_metrics,
    symmetric_mse_loss,
)


def init_state(cfg, rng) -> Tuple[base.TrainState, object]:
    model = base.build_model(cfg)
    tx = base.make_optimizer(cfg.optim)
    return base.init_model_state(cfg, model, rng, tx), model


def make_train_step(cfg, model, tx, axis_name=None):
    mcfg = cfg.method
    n_classes = cfg.data.num_classes
    n_dec = 1 + cfg.model.n_aux

    def train_step(state: base.TrainState,
                   batch) -> Tuple[base.TrainState, Dict[str, jax.Array]]:
        new_key, d1, p1, d2, p2, mix_key = jax.random.split(state.key, 6)
        # per-device decorrelation for pixel-level randomness; the
        # Dirichlet mix weight is ONE global draw per step (reference
        # :251) so mix_key stays shared
        d1, p1, d2, p2 = base.device_keys((d1, p1, d2, p2), axis_name)

        fwd = (base.apply_train_stacked if cfg.model.stack_decoders
               else base.apply_train)

        def loss_fn(params):
            if mcfg.fused_batch:
                # one fused forward over [labeled; unlabeled] — better MXU
                # utilization, joint-batch BN stats (documented deviation)
                nb = batch["image"].shape[0]
                both = jnp.concatenate([batch["image"], batch["uimage"]], 0)
                outs_all, bs2 = fwd(
                    model, params, state.batch_stats, both,
                    rngs={"dropout": d1, "perturb": p1})
                outs = [o[:nb] for o in outs_all]
                un_outs = [o[nb:] for o in outs_all]
            else:
                # labeled forward, then unlabeled forward continuing the
                # same running-stat stream (two sequential forwards in the
                # reference, :177,:185)
                outs, bs1 = fwd(
                    model, params, state.batch_stats, batch["image"],
                    rngs={"dropout": d1, "perturb": p1})
                un_outs, bs2 = fwd(
                    model, params, bs1, batch["uimage"],
                    rngs={"dropout": d2, "perturb": p2})

            labels = batch["label"]
            # supervised: mean over decoders of 0.5(CE+Dice)
            pairs = [base.supervised_ce_dice(o, labels,
                                             cfg.model.conv_backend)
                     for o in outs]
            ces = [p[0] for p in pairs]
            dices = [p[1] for p in pairs]
            sup = sum(0.5 * (c + d) for c, d in zip(ces, dices)) / n_dec

            # Dirichlet (or averaged) pseudo-label mix weights — ONE
            # global draw per step (reference :251)
            if "mix_w" in batch:
                # host-supplied draw: the torch-trajectory equivalence
                # test (tests/test_torch_trajectory.py) feeds the SAME
                # Dirichlet weights to the reference recipe and to this
                # step so the two trajectories stay comparable
                w = batch["mix_w"]
            elif mcfg.dynamic_mixing:
                w = jax.random.dirichlet(mix_key, jnp.ones((n_dec,)))
            else:
                w = jnp.full((n_dec,), 1.0 / n_dec)

            on_tpu_pallas = (cfg.model.conv_backend != "xla"
                             and jax.devices()[0].platform == "tpu")
            if (on_tpu_pallas and mcfg.fused_uncertainty
                    and mcfg.decoder_consistency_weight == 0):
                # uncertainty maps + pseudo-label in ONE kernel pass over
                # the stacked logits (pallas/uncertainty.py): softmaxes,
                # mean pred, KL maps and the mixed argmax never
                # materialize as C-padded HBM tensors
                from uaps_tpu.pallas import fused_uncertainty
                var_stack, pseudo = fused_uncertainty(
                    jnp.stack(un_outs), w)
                variances = [var_stack[d] for d in range(n_dec)]
                l_uncert = jnp.mean(var_stack)
            else:
                # uncertainty maps vs the average softmax
                softmaxes = [jax.nn.softmax(o, axis=-1) for o in un_outs]
                preds = sum(softmaxes) / n_dec
                variances = [kl_divergence_map(o, preds) for o in un_outs]
                ave_var = sum(variances) / n_dec
                l_uncert = jnp.mean(ave_var)
                if on_tpu_pallas:
                    # fused softmax-mix-argmax kernel (one VMEM pass over
                    # the D logit tensors; pallas/pseudo_label.py)
                    from uaps_tpu.pallas import fused_pseudo_label
                    pseudo = fused_pseudo_label(jnp.stack(un_outs), w)
                else:
                    mixed = sum(wi * jax.lax.stop_gradient(s)
                                for wi, s in zip(w, softmaxes))
                    pseudo = jnp.argmax(mixed, axis=-1)

            ps_terms = []
            for o, var in zip(un_outs, variances):
                ps_ce, ps_dice = base.supervised_ce_dice(
                    o, pseudo, cfg.model.conv_backend)
                ps = 0.5 * (ps_ce + ps_dice)
                if mcfg.uncertainty_gate:
                    ps = ps * jnp.mean(jnp.exp(-var))
                ps_terms.append(ps)
            ps_loss = sum(ps_terms) / n_dec

            w1 = base.ramp_weight(mcfg.consistency1, state.step,
                                  mcfg.ramp_iters, mcfg.consistency_rampup)
            w2 = base.ramp_weight(mcfg.consistency2, state.step,
                                  mcfg.ramp_iters, mcfg.consistency_rampup)

            loss = sup + w1 * ps_loss
            if mcfg.unramped_uncertainty:
                loss = loss + l_uncert          # MTiles variant (:287)
            else:
                loss = loss + w2 * l_uncert
            if mcfg.decoder_consistency_weight > 0:
                # MTiles dist_1..3 terms (reference multiplies them by 0)
                main_soft = softmaxes[0]
                dec_cons = sum(
                    symmetric_mse_loss(main_soft, s) for s in softmaxes[1:]
                ) / max(n_dec - 1, 1)
                loss = loss + mcfg.decoder_consistency_weight * dec_cons

            aux = {
                "outs0": outs[0], "bs": bs2, "sup": sup,
                "ce": sum(ces) / n_dec, "dice": sum(dices) / n_dec,
                "ps_loss": ps_loss, "l_uncert": l_uncert,
                "w1": w1, "w2": w2,
            }
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        grads = base.pmean_if(grads, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree.map(lambda p, u: p + u, state.params, updates)
        m = segmentation_metrics(aux["outs0"], batch["label"], n_classes)
        metrics = {
            "loss": loss, "sup_loss": aux["sup"], "ce_loss": aux["ce"],
            "dice_loss": aux["dice"], "ps_loss": aux["ps_loss"],
            "uncertainty_loss": aux["l_uncert"],
            "consistency_w1": aux["w1"], "consistency_w2": aux["w2"],
            "train_miou": m["miou"], "train_mdice": m["mdice"],
        }
        metrics = base.pmean_if(metrics, axis_name)
        return state.replace(step=state.step + 1, params=new_params,
                             batch_stats=base.pmean_if(aux["bs"], axis_name),
                             opt_state=new_opt,
                             key=new_key), metrics

    return train_step
