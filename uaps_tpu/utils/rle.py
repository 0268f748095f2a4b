"""RLE mask codecs + experiment-dir helpers (reference utilities.py:13-63).

mask2rle/make_mask reproduce the column-major (Fortran-order) run-length
encoding the reference carries for Kaggle-style mask exchange; they are
host-side numpy (never inside jit).
"""
from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np


def create_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def mask2rle(img: np.ndarray) -> str:
    """Binary mask -> 'start len start len ...' (1-indexed, column-major),
    matching reference utilities/utilities.py:36-45."""
    pixels = img.T.flatten()
    pixels = np.concatenate([[0], pixels, [0]])
    runs = np.where(pixels[1:] != pixels[:-1])[0] + 1
    runs[1::2] -= runs[::2]
    return " ".join(str(x) for x in runs)


def make_mask(rles: Sequence[str], shape: Tuple[int, int] = (256, 1600),
              n_classes: int = 4) -> np.ndarray:
    """Per-class RLE strings -> [H, W, n_classes] float mask
    (reference utilities/utilities.py:48-63 semantics)."""
    masks = np.zeros((shape[0] * shape[1], n_classes), np.float32)
    for c, rle in enumerate(rles):
        if not rle:
            continue
        nums = np.asarray(rle.split(), dtype=int)
        starts, lengths = nums[0::2] - 1, nums[1::2]
        for s, l in zip(starts, lengths):
            masks[s:s + l, c] = 1.0
    return masks.reshape(shape[1], shape[0], n_classes).transpose(1, 0, 2)
