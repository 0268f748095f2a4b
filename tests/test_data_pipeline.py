"""Real-image pipeline: split-protocol parity, streams, dataset variants.

Uses a tiny generated on-disk dataset (the reference ships no images
either). Split membership is checked against a direct sklearn call with
the reference's seeds — the property the labeled-ratio benchmarks depend on
(SURVEY.md §7 hard part 5).
"""
import dataclasses
import os

import numpy as np
import pytest

from uaps_tpu.utils.config import DataConfig
from uaps_tpu.data.pipeline import DefectDataset, discover_ids
from uaps_tpu.data.specs import SPECS, split_ids

pytestmark = pytest.mark.fast


@pytest.fixture(scope="module")
def fake_neu(tmp_path_factory):
    """48 train + 12 test tiny images in the NEU layout (.jpg/.png)."""
    import cv2
    root = tmp_path_factory.mktemp("neu")
    dirs = {k: root / k for k in
            ["train_images", "training_annot", "test_images", "test_annot"]}
    for d in dirs.values():
        os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for prefix, n, imdir, maskdir in [
            ("tr", 48, dirs["train_images"], dirs["training_annot"]),
            ("te", 12, dirs["test_images"], dirs["test_annot"])]:
        for i in range(n):
            img = rng.integers(0, 255, (40, 40, 3), np.uint8)
            mask = rng.integers(0, 4, (40, 40), np.uint8)
            cv2.imwrite(str(imdir / f"{prefix}{i:03d}.jpg"), img)
            cv2.imwrite(str(maskdir / f"{prefix}{i:03d}.png"), mask)
    return dirs


def neu_cfg(dirs, **kw):
    return DataConfig(
        name="neu", image_root=str(dirs["train_images"]),
        mask_root=str(dirs["training_annot"]),
        test_image_root=str(dirs["test_images"]),
        test_mask_root=str(dirs["test_annot"]),
        num_classes=4, batch_size=4, num_workers=2, **kw)


class TestSplits:
    def test_neu_protocol_matches_sklearn(self, fake_neu):
        ds = DefectDataset(neu_cfg(fake_neu), seed=0)
        from sklearn.model_selection import train_test_split
        ids = np.asarray(discover_ids(str(fake_neu["train_images"])))
        xx, val = train_test_split(ids, test_size=0.15, random_state=69)
        lab, unlab = train_test_split(xx, test_size=0.9, random_state=45)
        assert ds.splits["labeled"] == list(lab)
        assert ds.splits["unlabeled"] == list(unlab)
        assert ds.splits["val"] == list(val)
        assert len(ds.splits["test"]) == 12

    def test_splits_disjoint_and_complete(self, fake_neu):
        ds = DefectDataset(neu_cfg(fake_neu), seed=0)
        lab = set(ds.splits["labeled"])
        unlab = set(ds.splits["unlabeled"])
        val = set(ds.splits["val"])
        assert not (lab & unlab) and not (lab & val) and not (unlab & val)
        assert len(lab) + len(unlab) + len(val) == 48

    def test_labeled_fraction(self, fake_neu):
        ds = DefectDataset(neu_cfg(fake_neu, labeled_fraction=0.25), seed=0)
        n_train = len(ds.splits["labeled"]) + len(ds.splits["unlabeled"])
        assert len(ds.splits["labeled"]) == pytest.approx(
            0.25 * n_train, abs=1)

    def test_dagm_protocol(self):
        ids = [f"i{k:03d}" for k in range(100)]
        splits = split_ids(SPECS["dagm"], ids, None, 0.15, 0.10, 69, 45)
        assert len(splits["test"]) == 20
        total = sum(len(v) for k, v in splits.items() if k != "test")
        assert total == 80

    def test_valsplit_protocol_uses_val_as_test(self):
        ids = [f"i{k:03d}" for k in range(50)]
        splits = split_ids(SPECS["mtiles"], ids, None, 0.15, 0.20, 69, 45)
        assert splits["test"] == splits["val"]


class TestStreams:
    def test_train_iter_shapes_and_norm(self, fake_neu):
        ds = DefectDataset(neu_cfg(fake_neu), seed=0)
        batch = next(iter(ds.train_iter()))
        assert batch["image"].shape == (4, 256, 256, 3)
        assert batch["label"].shape == (4, 256, 256)
        assert batch["image"].dtype == np.float32
        assert batch["label"].dtype == np.int32
        assert set(np.unique(batch["label"])) <= {0, 1, 2, 3}
        # ImageNet-normalized: values centered, not in [0,1]
        assert batch["image"].min() < 0

    def test_infinite_beyond_epoch(self, fake_neu):
        # labeled split has only 4 ids (48*.85*.1) -> 1 batch/epoch;
        # the stream must keep producing (reference would StopIteration)
        ds = DefectDataset(neu_cfg(fake_neu), seed=0)
        it = ds.train_iter()
        for _ in range(5):
            b = next(it)
            assert b["image"].shape[0] == 4

    def test_weak_strong_stream(self, fake_neu):
        ds = DefectDataset(neu_cfg(fake_neu), seed=0)
        b = next(iter(ds.train_iter_weak_strong()))
        assert b["uimage"].shape == b["uimage_strong"].shape
        assert not np.allclose(b["uimage"], b["uimage_strong"])

    def test_val_and_test_iters(self, fake_neu):
        ds = DefectDataset(neu_cfg(fake_neu), seed=0)
        vb = list(ds.val_iter())
        assert sum(b["image"].shape[0] for b in vb) == 8  # 48*0.15 -> 8
        tb = list(ds.test_iter(batch_size=1))
        assert len(tb) == 12
        assert tb[0]["image"].shape == (1, 256, 256, 3)


class TestKoSDD2Semantics:
    def test_transpose_and_binarize(self, tmp_path):
        import cv2
        imdir, maskdir = tmp_path / "img", tmp_path / "ann"
        os.makedirs(imdir), os.makedirs(maskdir)
        rng = np.random.default_rng(0)
        for i in range(10):
            cv2.imwrite(str(imdir / f"k{i}.png"),
                        rng.integers(0, 255, (60, 30, 3), np.uint8))
            cv2.imwrite(str(maskdir / f"k{i}.png"),
                        rng.choice([0, 255], (60, 30)).astype(np.uint8))
        cfg = DataConfig(name="kosdd2", image_root=str(imdir),
                         mask_root=str(maskdir), num_classes=2,
                         batch_size=2, num_workers=1, labeled_fraction=0.4,
                         transpose_to_landscape=True, binarize_mask=True)
        ds = DefectDataset(cfg, seed=0)
        b = next(iter(ds.train_iter()))
        # resized to (512, 256) then transposed -> landscape (256, 512)
        assert b["image"].shape == (2, 256, 512, 3)
        assert set(np.unique(b["label"])) <= {0, 1}


class TestAugment:
    def test_ops_preserve_mask_alignment(self):
        from uaps_tpu.data import augment as A
        rng = np.random.default_rng(0)
        img = np.zeros((32, 32, 3), np.uint8)
        img[8:16, 8:16] = 200
        mask = np.zeros((32, 32), np.uint8)
        mask[8:16, 8:16] = 1
        aug = A.Compose([A.hflip(1.0), A.vflip(1.0), A.random_rotate90(1.0)])
        out_img, out_mask = aug(rng, img, mask)
        # geometric ops move image and mask together
        assert ((out_img[..., 0] > 100) == (out_mask == 1)).all()

    def test_photometric_ops_leave_mask(self):
        from uaps_tpu.data import augment as A
        rng = np.random.default_rng(0)
        img = np.full((16, 16, 3), 100, np.uint8)
        mask = np.arange(256, dtype=np.uint8).reshape(16, 16) % 4
        for op in [A.random_brightness_contrast(p=1.0), A.blur(1.0),
                   A.gauss_noise(1.0), A.color_jitter(1.0),
                   A.pixel_dropout(1.0), A.grid_distortion(0.0)]:
            _, m = op(rng, img.copy(), mask.copy())
            np.testing.assert_array_equal(m, mask)

    def test_normalize(self):
        from uaps_tpu.data.augment import normalize
        img = np.full((4, 4, 3), 255, np.uint8)
        out = normalize(img, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225))
        np.testing.assert_allclose(
            out[0, 0], (1 - np.array([0.485, 0.456, 0.406]))
            / np.array([0.229, 0.224, 0.225]), rtol=1e-5)
