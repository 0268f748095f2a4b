"""Pure-function op library: losses, ramps, metrics, perturbations, cutmix.

Everything here is jit-safe, NHWC, and takes explicit PRNG keys. The
semantics of each op are pinned to the reference implementation (see each
docstring for the file:line citation) and verified in tests/test_ops_*.py.
"""
from uaps_tpu.ops.losses import (
    cross_entropy_loss,
    binary_cross_entropy_loss,
    softmax_dice_loss,
    jaccard_loss,
    tversky_loss,
    focal_loss,
    softmax_mse_loss,
    softmax_kl_loss,
    symmetric_mse_loss,
    kl_divergence_map,
    entropy_minimization,
    entropy_map,
    feature_sim_loss,
    dice_loss_per_class,
)
from uaps_tpu.ops.losses_binary import (
    binary_focal_loss,
    iou_score,
    f_score,
    jaccard_loss_sigmoid,
    dice_loss_sigmoid,
    bce_jaccard_loss,
    bce_dice_loss,
    super_loss,
    kl_loss,
)
from uaps_tpu.ops.cutmix import (
    cutout_mask,
    generate_mix_data,
    generate_crossmix_data,
)
from uaps_tpu.ops.ramps import sigmoid_rampup, linear_rampup, cosine_rampdown
from uaps_tpu.ops.metrics import (
    pixel_accuracy,
    mean_iou,
    mean_dice,
    segmentation_metrics,
    per_class_iou,
)
from uaps_tpu.ops.perturbations import (
    feature_noise,
    feature_dropout,
    dropout,
    perturb_features,
    PERTURBATIONS,
)

__all__ = [k for k in dir() if not k.startswith("_")]
