"""Real-image host pipeline: discovery, seeded splits, augmented streams.

Replaces the reference's import-time dataloader modules (SURVEY.md §1 L0,
layering violation noted there) with an explicit object. Streams are
explicitly infinite for training (fixing the un-cycled zip StopIteration
path, SURVEY §5.3) and finite for val/test. Image decode + augmentation run
in a thread pool (cv2 releases the GIL) with a bounded prefetch queue — the
functional equivalent of torch DataLoader(num_workers=8, pin_memory=True).
"""
from __future__ import annotations

import os
import queue
import threading
from typing import Dict, Iterator, List, Optional

import numpy as np

from uaps_tpu.data import augment as A
from uaps_tpu.data.specs import SPECS, DatasetSpec, split_ids


def discover_ids(root: str) -> List[str]:
    """os.walk file-stem discovery (utilities/dataloaders.py:26-32)."""
    names = []
    for _, _, filenames in os.walk(root):
        for fn in filenames:
            names.append(fn.split(".")[0])
    return names


class DefectDataset:
    """Two-stream semi-supervised dataset over on-disk images."""

    def __init__(self, data_cfg, seed: int = 0):
        import cv2  # local import: keep module import light
        self._cv2 = cv2
        self.cfg = data_cfg
        self.spec: DatasetSpec = SPECS[data_cfg.name]
        self.seed = seed
        if not data_cfg.image_root:
            raise ValueError(
                f"dataset {data_cfg.name!r} needs data.image_root; "
                "the reference repo ships no images either "
                "(data/NEU-Seg is a placeholder)")
        train_ids = discover_ids(data_cfg.image_root)
        test_ids = (discover_ids(data_cfg.test_image_root)
                    if self.spec.has_test_dir and data_cfg.test_image_root
                    else None)
        self.splits = split_ids(
            self.spec, train_ids, test_ids, data_cfg.val_fraction,
            data_cfg.labeled_fraction, data_cfg.split_seed_val,
            data_cfg.split_seed_labeled)
        self._eval_aug = A.Compose([A.resize(*self.spec.resize_hw)])

    # ------------------------------------------------------------------
    def _read(self, image_root: str, mask_root: str, stem: str):
        cv2 = self._cv2
        img_path = os.path.join(image_root, stem + self.spec.img_ext)
        if self.spec.grayscale:
            img = cv2.imread(img_path, cv2.IMREAD_GRAYSCALE)
        else:
            img = cv2.cvtColor(cv2.imread(img_path), cv2.COLOR_BGR2RGB)
        mask = cv2.imread(os.path.join(mask_root, stem + self.spec.mask_ext),
                          cv2.IMREAD_GRAYSCALE)
        if img is None or mask is None:
            raise FileNotFoundError(f"missing image/mask for id {stem!r}")
        return img, mask

    def _example(self, rng, stem: str, aug: A.Compose, roots=None):
        """Augmented uint8 image + int32 mask (normalization happens
        batched in _finalize, optionally through the native library)."""
        image_root, mask_root = roots or (self.cfg.image_root,
                                          self.cfg.mask_root)
        img, mask = self._read(image_root, mask_root, stem)
        img, mask = aug(rng, img, mask)
        if img.ndim == 2:
            img = img[..., None]
        y = mask.astype(np.int32)
        if self.spec.binarize_mask:
            y = (y / 255.0).astype(np.int32)
        if self.spec.transpose_after_resize:
            img = np.transpose(img, (1, 0, 2))
            y = np.transpose(y, (1, 0))
        return np.ascontiguousarray(img), y

    def _finalize(self, imgs_u8, masks):
        """Stack + normalize a batch; per-pixel work runs in the native
        host-ops library when available (uaps_tpu/native), numpy otherwise."""
        from uaps_tpu import native
        batch_u8 = np.stack(imgs_u8)
        x = native.normalize_batch(batch_u8, self.cfg.mean, self.cfg.std)
        return x, np.stack(masks)

    # ------------------------------------------------------------------
    def _infinite_batches(self, ids: List[str], aug_factory, salt: int,
                          extra_aug_factory=None) -> Iterator:
        """Infinite shuffled batch stream with threaded prefetch."""
        bs = self.cfg.batch_size
        n_workers = max(1, self.cfg.num_workers)
        out_q: "queue.Queue" = queue.Queue(maxsize=4)

        def producer():
            rng = np.random.default_rng(self.seed + salt)
            aug = aug_factory()
            extra = extra_aug_factory() if extra_aug_factory else None
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(n_workers) as pool:
                while True:
                    order = rng.permutation(len(ids))
                    for i in range(0, len(order) - bs + 1, bs):
                        stems = [ids[j] for j in order[i:i + bs]]
                        seeds = rng.integers(0, 2**31, size=bs)
                        def load(args):
                            stem, s = args
                            r = np.random.default_rng(int(s))
                            if extra is None:
                                return self._example(r, stem, aug)
                            x1, y1 = self._example(r, stem, aug)
                            r2 = np.random.default_rng(int(s) + 1)
                            x2, y2 = self._example(r2, stem, extra)
                            return x1, y1, x2, y2
                        results = list(pool.map(load, zip(stems, seeds)))
                        x, y = self._finalize([r[0] for r in results],
                                              [r[1] for r in results])
                        batch = {"image": x, "label": y}
                        if extra is not None:
                            x2, y2 = self._finalize(
                                [r[2] for r in results],
                                [r[3] for r in results])
                            batch["image2"] = x2
                            batch["label2"] = y2
                        out_q.put(batch)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            yield out_q.get()

    # ------------------------------------------------------------------
    def train_iter(self) -> Iterator[Dict[str, np.ndarray]]:
        lab = self._infinite_batches(self.splits["labeled"],
                                     self.spec.train_aug, salt=1)
        unlab = self._infinite_batches(self.splits["unlabeled"],
                                       self.spec.train_aug, salt=2)
        for a, b in zip(lab, unlab):
            yield {"image": a["image"], "label": a["label"],
                   "uimage": b["image"], "ulabel": b["label"]}

    def train_iter_weak_strong(self) -> Iterator[Dict[str, np.ndarray]]:
        """UCC stream: labeled (train aug) + weak/strong unlabeled pair
        (UCC/UCC_dataloaders.py NEUDataset_SW:104-143)."""
        if self.spec.weak_aug is None or self.spec.strong_aug is None:
            raise ValueError(
                f"dataset {self.spec.name!r} has no weak/strong recipe")
        lab = self._infinite_batches(self.splits["labeled"],
                                     self.spec.train_aug, salt=1)
        unlab = self._infinite_batches(
            self.splits["unlabeled"], self.spec.weak_aug, salt=2,
            extra_aug_factory=self.spec.strong_aug)
        for a, b in zip(lab, unlab):
            yield {"image": a["image"], "label": a["label"],
                   "uimage": b["image"], "ulabel": b["label"],
                   "uimage_strong": b["image2"]}

    def _finite(self, ids: List[str], roots=None, batch_size=None,
                salt: int = 99) -> Iterator[Dict[str, np.ndarray]]:
        bs = batch_size or self.cfg.batch_size
        rng = np.random.default_rng(self.seed + salt)
        for i in range(0, len(ids), bs):
            stems = ids[i:i + bs]
            xs, ys = [], []
            for stem in stems:
                x, y = self._example(rng, stem, self._eval_aug, roots)
                xs.append(x)
                ys.append(y)
            imgs, labels = self._finalize(xs, ys)
            yield {"image": imgs, "label": labels}

    def val_iter(self):
        return self._finite(self.splits["val"])

    def test_iter(self, batch_size: Optional[int] = None):
        roots = None
        if self.spec.has_test_dir and self.cfg.test_image_root:
            roots = (self.cfg.test_image_root, self.cfg.test_mask_root)
        return self._finite(self.splits["test"], roots=roots,
                            batch_size=batch_size)
