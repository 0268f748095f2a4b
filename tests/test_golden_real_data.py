"""Golden-metric regression on real data (SURVEY.md §4f) — opt-in.

Runs when real NEU-Seg data is present, discovered in either of two ways
(the reference repo ships no images; data/NEU-Seg is a 1-byte
placeholder — provision with scripts/prepare_data.py):

1. Conventional layout (auto-discovered): $UAPS_DATA_ROOT/neu (default
   /root/data/neu) with images/ annotations/ [test_images/
   test_annotations/] — the layout `prepare_data.py ingest` produces.
2. Explicit env vars: UAPS_NEU_IMAGES / UAPS_NEU_MASKS /
   UAPS_NEU_TEST_IMAGES / UAPS_NEU_TEST_MASKS.

UAPS_NEU_CKPT optionally names a trained reference .pth to import and
score against the stored-notebook numbers (BASELINE.md: mIoU 75.77 /
mDice 85.20, 0.5-pt target).
"""
import os

import numpy as np
import pytest

_CONV = os.path.join(os.environ.get("UAPS_DATA_ROOT", "/root/data"), "neu")


def _roots():
    """(images, masks, test_images, test_masks) or None."""
    if os.environ.get("UAPS_NEU_IMAGES"):
        return (os.environ["UAPS_NEU_IMAGES"],
                os.environ["UAPS_NEU_MASKS"],
                os.environ.get("UAPS_NEU_TEST_IMAGES", ""),
                os.environ.get("UAPS_NEU_TEST_MASKS", ""))
    img = os.path.join(_CONV, "images")
    if os.path.isdir(img):
        t = os.path.join(_CONV, "test_images")
        return (img, os.path.join(_CONV, "annotations"),
                t if os.path.isdir(t) else "",
                os.path.join(_CONV, "test_annotations")
                if os.path.isdir(t) else "")
    return None


pytestmark = pytest.mark.skipif(
    _roots() is None,
    reason="real NEU-Seg data not provided (run scripts/prepare_data.py "
           "ingest --dataset neu --source <RAW>, or set "
           "UAPS_NEU_IMAGES/MASKS)",
)


def _cfg():
    import dataclasses
    from uaps_tpu.utils.config import preset
    img, mask, timg, tmask = _roots()
    cfg = preset("neu")
    cfg.data = dataclasses.replace(
        cfg.data, image_root=img, mask_root=mask,
        test_image_root=timg, test_mask_root=tmask,
    )
    return cfg


def test_real_pipeline_shapes():
    from uaps_tpu.train import make_data
    cfg = _cfg()
    data = make_data(cfg, seed=0)
    batch = next(iter(data.train_iter()))
    assert batch["image"].shape == (16, 256, 256, 3)
    assert set(np.unique(batch["label"])) <= set(range(cfg.data.num_classes))


def test_reference_checkpoint_scores_golden():
    """Import a trained reference checkpoint and reproduce the stored
    notebook metrics within 0.5 pt mIoU (BASELINE.json target)."""
    ckpt = os.environ.get("UAPS_NEU_CKPT")
    if not ckpt:
        pytest.skip("UAPS_NEU_CKPT not set")
    import jax
    import jax.numpy as jnp
    from uaps_tpu.models import net_factory
    from uaps_tpu.utils.torch_import import load_pth
    from uaps_tpu.ops import segmentation_metrics
    from uaps_tpu.train import make_data

    cfg = _cfg()
    model = net_factory("unet_uaps", class_num=4)
    x0 = jnp.zeros((1, 256, 256, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "perturb": jax.random.key(2)}, x0, train=False)
    params, stats = load_pth(ckpt, variables["params"],
                             variables["batch_stats"])

    @jax.jit
    def predict(image):
        return model.apply({"params": params, "batch_stats": stats},
                           image, train=False, method=model.main_only)

    data = make_data(cfg, seed=0)
    sums, n = {}, 0
    for batch in data.test_iter(batch_size=1):
        m = segmentation_metrics(predict(jnp.asarray(batch["image"])),
                                 jnp.asarray(batch["label"]), 4)
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    miou = 100 * sums["miou"] / n
    mdice = 100 * sums["mdice"] / n
    print(f"imported ckpt: mIoU {miou:.2f} mDice {mdice:.2f} on {n} images")
    assert abs(miou - 75.77) < 0.5  # UAPS-Testing.ipynb stored output
