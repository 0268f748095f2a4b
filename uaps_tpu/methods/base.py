"""Shared training machinery: TrainState, optimizer, sup loss, eval step.

Replaces the duplicated `class Network` skeleton of every reference trainer
(SURVEY.md §2.2) with pure functions over an explicit state pytree.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from uaps_tpu.models import net_factory
from uaps_tpu.ops import (
    cross_entropy_loss,
    softmax_dice_loss,
    segmentation_metrics,
    mean_dice,
)

Array = jax.Array


@struct.dataclass
class TrainState:
    """Everything that evolves during training, in one pytree.

    `ema_*` carry the mean-teacher weights (MT/UAMT; reference
    MT_train.py:79-83 update_ema_variables); `second` carries the full
    second-model state for CPS (reference CPS_model.py:15-23). Unused
    fields are None and vanish from the pytree.
    """
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any
    key: Array
    ema_params: Any = None
    ema_batch_stats: Any = None
    second: Any = None  # nested TrainState for dual-model methods


def make_optimizer(optim_cfg) -> optax.GradientTransformation:
    """Adam with injected lr so the host-side plateau scheduler can adjust
    it without recompiling (reference uses torch ReduceLROnPlateau,
    UAPS_train.py:112-113)."""
    return optax.inject_hyperparams(optax.adam)(
        learning_rate=optim_cfg.base_lr, b1=optim_cfg.b1, b2=optim_cfg.b2,
        eps=optim_cfg.eps,
    )


def get_lr(state: TrainState) -> float:
    return float(state.opt_state.hyperparams["learning_rate"])


def set_lr(state: TrainState, lr: float) -> TrainState:
    hp = dict(state.opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(
        opt_state=state.opt_state._replace(hyperparams=hp))


class PlateauScheduler:
    """ReduceLROnPlateau(mode='max', factor, patience, min_lr) — host-side,
    stepped once per validation epoch on val mDice
    (UAPS_train.py:113,402)."""

    # torch default improvement threshold: rel 1e-4 (mode='max' =>
    # metric > best * (1 + threshold) counts as improvement)
    THRESHOLD = 1e-4

    def __init__(self, optim_cfg):
        self.factor = optim_cfg.plateau_factor
        self.patience = optim_cfg.plateau_patience
        self.min_lr = optim_cfg.min_lr
        self.best = -float("inf")
        self.bad_epochs = 0

    def step(self, state: TrainState, metric: float) -> TrainState:
        if metric > self.best * (1.0 + self.THRESHOLD) or \
                self.best == -float("inf"):
            self.best = metric
            self.bad_epochs = 0
            return state
        self.bad_epochs += 1
        if self.bad_epochs > self.patience:
            self.bad_epochs = 0
            new_lr = max(get_lr(state) * self.factor, self.min_lr)
            state = set_lr(state, new_lr)
        return state


_MODEL_ENUMS = {
    "conv_backend": {"auto", "fused", "chain", "xla"},
    "conv_variant": {"taps", "im2col", "dhdw", "flat", "dwout", "dwnp",
                     "dwm", "dwmf", "fullh"},
    "head_variant": {"taps", "im2col", "dhdw", "dwnp", "dwm", "dwmf",
                     "xla"},
    "dropout_backend": {"auto", "xla", "pallas"},
    "pool_backend": {"auto", "pallas", "maskpool", "xla"},
    "bn_backend": {"auto", "4d", "flat"},
}


def build_model(cfg):
    # validate enum knobs EARLY and on every platform — on CPU the
    # pallas dispatch gates are off, so a typo'd value would otherwise
    # silently run the fallback (VERDICT r3 #8 knob hygiene)
    for field, allowed in _MODEL_ENUMS.items():
        v = getattr(cfg.model, field)
        if v not in allowed:
            raise ValueError(f"ModelConfig.{field}={v!r}; "
                             f"expected one of {sorted(allowed)}")
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        cfg.model.compute_dtype]
    kwargs = {"remat": cfg.model.remat,
              "conv_backend": cfg.model.conv_backend,
              "conv_variant": cfg.model.conv_variant}
    if cfg.model.name == "unet_uaps":
        kwargs["n_aux"] = cfg.model.n_aux
    if cfg.model.name in ("unet", "unet_uaps", "unet_cct", "unet_ucc",
                          "unet_ccps"):
        kwargs["nchw_levels"] = cfg.model.nchw_levels
        kwargs["head_variant"] = cfg.model.head_variant
        kwargs["dropout_backend"] = cfg.model.dropout_backend
        kwargs["pool_backend"] = cfg.model.pool_backend
        kwargs["bn_backend"] = cfg.model.bn_backend
    if cfg.model.name in ("unet_uaps", "unet_cct", "unet_ucc",
                          "unet_ccps"):
        kwargs["packed_heads"] = cfg.model.packed_heads
    return net_factory(cfg.model.name, in_chns=cfg.data.in_channels,
                       class_num=cfg.data.num_classes, dtype=dtype, **kwargs)


def init_model_state(cfg, model, rng: Array,
                     tx: optax.GradientTransformation) -> TrainState:
    h, w = cfg.data.image_size
    dummy = jnp.zeros((1, h, w, cfg.data.in_channels), jnp.float32)
    p_key, d_key, pt_key, s_key = jax.random.split(rng, 4)
    variables = model.init(
        {"params": p_key, "dropout": d_key, "perturb": pt_key},
        dummy, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        key=s_key,
    )


def apply_train(model, params, batch_stats, x, rngs) -> Tuple[Any, Any]:
    """One training-mode forward; returns (outputs, new_batch_stats)."""
    out, mutated = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=True,
        rngs=rngs, mutable=["batch_stats"])
    return out, mutated["batch_stats"]


def apply_train_stacked(model, params, batch_stats, x, rngs
                        ) -> Tuple[Any, Any]:
    """Training forward with the 1+n_aux decoders vmapped over stacked
    params (models/unet.py stacked_decoder_apply): encoder once, perturb,
    one vmapped decoder chain. Numerically equivalent to apply_train on a
    MultiDecoderUNet (same params, same per-decoder BN stats; perturbation
    noise comes from an explicit key split instead of flax make_rng path
    folding, so the random draw differs — the distribution does not)."""
    from uaps_tpu.models.unet import stacked_decoder_apply
    from uaps_tpu.ops.perturbations import perturb_features

    feats, enc_mut = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, True,
        rngs=rngs, mutable=["batch_stats"], method=type(model).encode)
    keys = jax.random.split(rngs["perturb"], len(model.perturbations))
    axes = getattr(model, "feat_channel_axes", None)
    feats_all = [feats] + [
        perturb_features(k, feats, kind, axes,
                         backend=model.conv_backend)
        for k, kind in zip(keys, model.perturbations)]
    stacked = [jnp.stack([fa[i] for fa in feats_all])
               for i in range(len(feats))]
    outs, dec_bs = stacked_decoder_apply(model, params, batch_stats,
                                         stacked, train=True)
    new_bs = {**enc_mut["batch_stats"], **dec_bs}
    return [outs[i] for i in range(len(feats_all))], new_bs


def supervised_ce_dice(logits: Array, labels: Array,
                       backend: str = "auto") -> Tuple[Array, Array]:
    """The reference's universal supervised pair: (CE, Dice)
    (UAPS_train.py:194-211, baseline_train.py:161-164).

    On TPU this routes through the fused Pallas kernel
    (pallas/ce_dice.py): one channels-in-sublanes pass computes both
    losses' statistics with an analytic VJP, avoiding the C->128 lane
    padding XLA pays on every pass over [B,H,W,C] class tensors.
    `backend` is ModelConfig.conv_backend ("xla" = plain jnp path — the
    GSPMD multi-device setting, where pallas_call runs replicated)."""
    h, w = logits.shape[1:3]
    if (backend != "xla" and jax.devices()[0].platform == "tpu"
            and h % 8 == 0 and w % 128 == 0):
        from uaps_tpu.pallas.ce_dice import fused_ce_dice
        return fused_ce_dice(logits, labels)
    return cross_entropy_loss(logits, labels), softmax_dice_loss(logits, labels)


def make_eval_step(cfg, model) -> Callable:
    """Main-decoder-only validation step: loss = 0.5(CE + (1 - mDice))
    + metrics, exactly the reference protocol (UAPS_train.py:377-393).

    Returns metric SUMS weighted by nothing (per-batch means) — the caller
    averages over batches like the reference's running_val_* accumulators.
    """
    n_classes = cfg.data.num_classes
    has_main_only = hasattr(model, "main_only")

    @jax.jit
    def eval_step(params, batch_stats, batch) -> Dict[str, Array]:
        variables = {"params": params, "batch_stats": batch_stats}
        if has_main_only:
            logits = model.apply(variables, batch["image"], train=False,
                                 method=model.main_only)
        else:
            out = model.apply(variables, batch["image"], train=False)
            logits = out["dp0"] if isinstance(out, dict) else out
        labels = batch["label"]
        ce = cross_entropy_loss(logits, labels)
        m = segmentation_metrics(logits, labels, n_classes)
        dice_loss_val = 1.0 - mean_dice(logits, labels, n_classes)
        return {
            "val_loss": 0.5 * (ce + dice_loss_val),
            "val_ce": ce,
            "val_dice_loss": dice_loss_val,
            "val_miou": m["miou"],
            "val_mdice": m["mdice"],
            "val_acc": m["pixel_acc"],
        }

    return eval_step


def device_keys(keys, axis_name):
    """Decorrelate per-device randomness under shard_map: fold the data-
    axis index into each USE key (the carried state.key stays device-
    independent so state remains replicated)."""
    if axis_name is None:
        return keys
    idx = jax.lax.axis_index(axis_name)
    return tuple(jax.random.fold_in(k, idx) for k in keys)


def pmean_if(tree, axis_name):
    """pmean a pytree when running under a mapped axis (else identity)."""
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def ramp_weight(cmax: float, step: Array, ramp_iters: int,
                rampup_length: float) -> Array:
    """consistency * sigmoid_rampup(step // ramp_iters, rampup)
    (UAPS_train.py:81-87,279-280)."""
    from uaps_tpu.ops.ramps import sigmoid_rampup
    epoch = (step // ramp_iters).astype(jnp.float32)
    return cmax * sigmoid_rampup(epoch, rampup_length)
