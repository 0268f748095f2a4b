"""Evaluation CLI — replaces the reference's 11 testing notebooks.

Protocol pinned to UAPS-Testing.ipynb (SURVEY.md §3.4): per-image (bs=1)
prediction with the main decoder, mIoU/mDice/pixel-accuracy averaged over
the test set, per-class IoU table, optional segmentation-map and
KL-uncertainty visualizations, plus a p50/p99 single-image latency report
(the BASELINE.json latency metric). All three metrics come from ONE jitted
pass per image instead of the notebooks' three full sweeps.

    python -m uaps_tpu.eval --preset neu --method uaps \
        --ckpt runs/neu/checkpoints [--save_viz DIR] [--split test]
"""
from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from uaps_tpu.methods import get_method, base as method_base
from uaps_tpu.ops import per_class_iou, segmentation_metrics, \
    kl_divergence_map
from uaps_tpu.train import make_data, parse_args
from uaps_tpu.utils.checkpoint import CheckpointManager

# NEU color map used by the notebooks' decode_segmap-style viz
_PALETTE = np.asarray(
    [[0, 0, 0], [220, 20, 60], [0, 200, 70], [30, 100, 220],
     [250, 170, 30], [170, 30, 250], [30, 250, 250]], np.uint8)


def colorize(mask: np.ndarray) -> np.ndarray:
    return _PALETTE[np.clip(mask, 0, len(_PALETTE) - 1)]


def evaluate(cfg, ckpt_dir: str, split: str = "test",
             save_viz: str = "", use_best: bool = True,
             which: str = "model1", tta: bool = False) -> Dict[str, float]:
    """`which` selects the weights to score: 'model1' (default),
    'model2' (the CPS second net, reference CPS_train.py:352-377 evaluates
    and checkpoints both), or 'ema' (the MT/UAMT mean-teacher weights).
    `tta` enables test-time augmentation: BaseNet models use their
    multi-scale flip harness (reference utilities/base.py:23-46); U-Net
    family models average softmax over the 4 H/V flips."""
    method = get_method(cfg.method.name)
    state, model = method.init_state(cfg, jax.random.key(cfg.run.seed))
    # accept a run dir (out_dir of train.py) as well as its checkpoints/:
    # an orbax root holds numeric step dirs; a run dir holds checkpoints/
    sub = os.path.join(ckpt_dir, "checkpoints")
    if os.path.isdir(sub) and not any(
            e.isdigit() for e in os.listdir(ckpt_dir)):
        ckpt_dir = sub
    ckpt = CheckpointManager(os.path.abspath(ckpt_dir))
    abstract = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
    step = ckpt.best_step() if use_best else ckpt.latest_step()
    restored, _ = ckpt.restore(abstract, step=step)
    if restored is None:
        raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
    state = restored
    print(f"loaded checkpoint step {step} from {ckpt_dir}")
    if which == "model2":
        if state.second is None:
            raise ValueError(
                f"--model2: method {cfg.method.name!r} carries no second "
                "model state (only CPS does)")
        eval_params = state.second.params
        eval_bstats = state.second.batch_stats
    elif which == "ema":
        if state.ema_params is None:
            raise ValueError(
                f"--eval_ema: method {cfg.method.name!r} carries no EMA "
                "teacher (only MT/UAMT do)")
        eval_params = state.ema_params
        eval_bstats = state.ema_batch_stats or state.batch_stats
    else:
        eval_params = state.params
        eval_bstats = state.batch_stats

    n_classes = cfg.data.num_classes
    has_main_only = hasattr(model, "main_only")
    is_basenet = cfg.model.name.startswith("basenet")

    def _forward(variables, image):
        if has_main_only:
            return model.apply(variables, image, train=False,
                               method=model.main_only)
        out = model.apply(variables, image, train=False)
        return out["dp0"] if isinstance(out, dict) else out

    @jax.jit
    def predict(params, batch_stats, image):
        """Returns class scores [B,H,W,C] (logits, or softmax sums under
        TTA — argmax/metrics semantics are identical)."""
        variables = {"params": params, "batch_stats": batch_stats}
        if tta and is_basenet:
            return model.apply(variables, image, train=False, tta=True)
        if tta:
            # U-Net family flip-TTA: mean softmax over H/V flips
            from uaps_tpu.ops.tta import flip_tta_softmax
            return flip_tta_softmax(_forward, variables, image)
        return _forward(variables, image)

    @jax.jit
    def uncertainty(params, batch_stats, image):
        """KL(main || avg with aux1) map, the notebook's variance viz."""
        variables = {"params": params, "batch_stats": batch_stats}
        out = model.apply(variables, image, train=False,
                          rngs={"perturb": jax.random.key(0)})
        outs = out if isinstance(out, tuple) else (out,)
        if len(outs) < 2:
            return jnp.zeros(image.shape[:3])
        preds = sum(jax.nn.softmax(o, axis=-1) for o in outs) / len(outs)
        return kl_divergence_map(outs[0], preds)

    data = make_data(cfg, seed=cfg.run.seed)
    it = data.test_iter(batch_size=1) if split == "test" else data.val_iter()

    sums: Dict[str, float] = {}
    class_iou_sum = np.zeros(n_classes)
    class_iou_count = np.zeros(n_classes)
    latencies: List[float] = []
    n = 0
    if save_viz:
        os.makedirs(save_viz, exist_ok=True)

    for batch in it:
        image = jnp.asarray(batch["image"])
        label = jnp.asarray(batch["label"])
        t0 = time.perf_counter()
        logits = predict(eval_params, eval_bstats, image)
        logits_np = np.asarray(logits)  # hard sync for honest latency
        latencies.append(time.perf_counter() - t0)
        m = segmentation_metrics(logits, label, n_classes)
        ciou = np.asarray(per_class_iou(logits, label, n_classes))
        present = ~np.isnan(ciou)
        class_iou_sum[present] += ciou[present]
        class_iou_count[present] += 1
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        if save_viz and n < 16:
            import cv2
            pred = np.argmax(logits_np[0], axis=-1)
            cv2.imwrite(os.path.join(save_viz, f"{n:03d}_pred.png"),
                        cv2.cvtColor(colorize(pred), cv2.COLOR_RGB2BGR))
            cv2.imwrite(os.path.join(save_viz, f"{n:03d}_gt.png"),
                        cv2.cvtColor(colorize(np.asarray(label[0])),
                                     cv2.COLOR_RGB2BGR))
            umap = np.asarray(uncertainty(eval_params, eval_bstats,
                                          image))[0]
            umap = (255 * umap / max(umap.max(), 1e-8)).astype(np.uint8)
            cv2.imwrite(os.path.join(save_viz, f"{n:03d}_uncert.png"),
                        cv2.applyColorMap(umap, cv2.COLORMAP_JET))
        n += 1

    results = {k: v / max(n, 1) for k, v in sums.items()}
    lat = np.asarray(latencies[1:] or latencies)  # drop compile step
    results["p50_latency_ms"] = float(np.percentile(lat, 50) * 1000)
    results["p99_latency_ms"] = float(np.percentile(lat, 99) * 1000)
    results["num_images"] = n

    # notebook-style summary table
    try:
        from tabulate import tabulate
        rows = [["mIoU", f"{100 * results['miou']:.2f}%"],
                ["mDice", f"{100 * results['mdice']:.2f}%"],
                ["Pixel Acc", f"{100 * results['pixel_acc']:.2f}%"],
                ["p50 latency", f"{results['p50_latency_ms']:.2f} ms"],
                ["images", n]]
        print(tabulate(rows, headers=["metric", "value"]))
    except ImportError:
        print(json.dumps(results, indent=2))
    print("per-class IoU (classes 1..C-1, averaged over images where "
          "the class is present):")
    for c in range(1, n_classes):
        denom = max(class_iou_count[c], 1)
        print(f"  class_{c}_IoU: {class_iou_sum[c] / denom:.4f}")
    return results


def main(argv=None):
    cfg, args = parse_args(argv)
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default=None)
    p.add_argument("--split", default="test", choices=["test", "val"])
    p.add_argument("--save_viz", default="")
    p.add_argument("--latest", action="store_true")
    p.add_argument("--model2", action="store_true",
                   help="evaluate the CPS second net "
                        "(reference CPS_train.py:352-377)")
    p.add_argument("--eval_ema", action="store_true",
                   help="evaluate the MT/UAMT EMA teacher weights")
    p.add_argument("--tta", action="store_true",
                   help="test-time augmentation (BaseNet multi-scale flip "
                        "harness; flip-averaging for U-Net models)")
    extra, _ = p.parse_known_args(argv)
    which = ("model2" if extra.model2
             else ("ema" if extra.eval_ema else "model1"))
    ckpt_dir = extra.ckpt or os.path.join(cfg.run.out_dir, "checkpoints")
    return evaluate(cfg, ckpt_dir, split=extra.split,
                    save_viz=extra.save_viz, use_best=not extra.latest,
                    which=which, tta=extra.tta)


if __name__ == "__main__":
    main()
