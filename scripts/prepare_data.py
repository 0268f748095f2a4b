"""Dataset acquisition/ingest + layout validation for the 4 UAPS datasets.

The reference repo ships NO images (`data/NEU-Seg` is a 1-byte
placeholder) and points at external sources (reference README.md:50-59):

  NEU-Seg  https://ieeexplore.ieee.org/document/8930292
           (commonly mirrored as "NEU-Seg" / DYW "NEU_data")
  DAGM     https://www.kaggle.com/datasets/mhskjelvareid/
           dagm-2007-competition-dataset-optical-inspection
  MTiles   https://www.kaggle.com/datasets/alex000kim/
           magnetic-tile-surface-defects
  KoSDD2   https://www.vicos.si/resources/kolektorsdd2/

This script takes a downloaded raw directory and produces the
CONVENTIONAL layout the framework (and tests/test_golden_real_data.py)
auto-discovers:

    <root>/<dataset>/images/            training images
    <root>/<dataset>/annotations/       training masks (same stems)
    <root>/<dataset>/test_images/       (neu, kosdd2 — datasets with a
    <root>/<dataset>/test_annotations/   dedicated test dir)

Usage:
    python scripts/prepare_data.py ingest  --dataset neu --source RAWDIR \
        [--root /root/data] [--copy]
    python scripts/prepare_data.py validate --dataset neu [--root /root/data]
    python scripts/prepare_data.py validate --all

`ingest` finds image/mask directory pairs inside RAWDIR by stem matching
(symlinks by default; --copy to materialize). `validate` checks the layout
end-to-end — stem pairing, decodability, mask label range, split sizes —
and prints the exact training + golden-eval commands for the dataset.
"""
from __future__ import annotations

import argparse
import os
import re
import shutil
import sys
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_ROOT = os.environ.get("UAPS_DATA_ROOT", "/root/data")

IMG_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".PNG", ".JPG"}

# per-dataset facts mirrored from uaps_tpu/data/specs.py
DATASETS = {
    "neu": dict(classes=4, has_test_dir=True, preset="neu",
                golden="mIoU 75.77 / mDice 85.20 (UAPS-Testing.ipynb)"),
    "dagm": dict(classes=7, has_test_dir=False, preset="dagm",
                 golden="mIoU 74.57 / mDice 84.78"),
    "mtiles": dict(classes=6, has_test_dir=False, preset="mtiles",
                   golden="mIoU 53.00 / mDice 60.27"),
    "kosdd2": dict(classes=2, has_test_dir=True, preset="kosdd2",
                   golden="mIoU 52.72 / mDice 62.99"),
}


def _scan_dirs(source: str) -> Dict[str, List[str]]:
    """Map directory -> contained image-like filenames."""
    found = defaultdict(list)
    for dirpath, _, filenames in os.walk(source, followlinks=True):
        for fn in filenames:
            if os.path.splitext(fn)[1] in IMG_EXTS:
                found[dirpath].append(fn)
    return found


def _stem(fn: str) -> str:
    # extension-only split: inner dots stay part of the stem so
    # img.v1.png / img.v2.png pair independently. Ingest sanitizes
    # inner dots out of DESTINATION names, because the training
    # pipeline reads files as <first-dot stem> + ext
    # (data/pipeline.py:28).
    return os.path.splitext(fn)[0]


def _dir_tag(d: str, source: str) -> str:
    rel = os.path.relpath(d, source)
    return re.sub(r"[^A-Za-z0-9_-]+", "_", rel)


def _pair_dirs(found: Dict[str, List[str]], source: str = "/"
               ) -> List[Tuple[str, str, List[str]]]:
    """Find (image_dir, mask_dir, stems) pairs by matching stem sets.

    Masks are recognized by directory name hints (mask/annot/label/gt/
    ground) or, failing that, by being the grayscale member of a pair
    with >=90% stem overlap. Hints are tested against the SOURCE-relative
    path, so a hint substring in the download's parent path (e.g.
    /home/gtaylor/raw) cannot make every directory a mask candidate."""
    hints = ("mask", "annot", "label", "gt", "ground")

    def _rel_lower(p):
        return os.path.relpath(p, source).lower()

    dirs = list(found)
    pairs = []
    used = set()
    for d in dirs:
        if d in used or any(h in os.path.basename(d).lower() for h in hints):
            continue
        stems_d = {_stem(f) for f in found[d]}
        best = None
        for m in dirs:
            if m == d or m in used:
                continue
            if not any(h in _rel_lower(m) for h in hints):
                continue
            stems_m = {_stem(f) for f in found[m]}
            inter = stems_d & stems_m
            if len(inter) >= 0.9 * max(len(stems_d), 1):
                if best is None or len(inter) > len(best[1]):
                    best = (m, inter)
        if best:
            used.update({d, best[0]})
            pairs.append((d, best[0], sorted(best[1])))
    return pairs


def _place(src: str, dst: str, copy: bool):
    if os.path.lexists(dst):
        os.remove(dst)
    if copy:
        shutil.copy2(src, dst)
    else:
        os.symlink(os.path.abspath(src), dst)


def ingest(dataset: str, source: str, root: str, copy: bool = False):
    info = DATASETS[dataset]
    out = os.path.join(root, dataset)
    found = _scan_dirs(source)
    pairs = _pair_dirs(found, source)
    if not pairs:
        sys.exit(f"ERROR: no image/mask directory pairs found under "
                 f"{source}. Expected directories of images plus a "
                 f"mask/annotation directory with matching file stems.")
    # classify train vs test pairs by path hint — RELATIVE to the source
    # root, so a 'test' in the download's parent path (e.g. /tmp/pytest-
    # .../test_x/raw) cannot reclassify the whole dataset
    def is_test(p):
        return any("test" in os.path.relpath(d, source).lower()
                   for d in p[:2])

    train_pairs = [p for p in pairs if not is_test(p)] or pairs
    test_pairs = [p for p in pairs if is_test(p)]
    plan = [("images", "annotations", train_pairs)]
    if test_pairs and train_pairs is not pairs:
        if info["has_test_dir"]:
            plan.append(("test_images", "test_annotations", test_pairs))
        else:
            # dataset spec has no held-out dir (split happens in the
            # pipeline) but the raw layout ships Train/Test halves —
            # keep the data: fold the test pairs into the train set
            # rather than silently dropping half the download
            print(f"note: {dataset} uses an in-pipeline split; folding "
                  f"{sum(len(s) for *_, s in test_pairs)} 'test' pairs "
                  f"into images/ (no held-out dir in the spec)")
            train_pairs = train_pairs + test_pairs
            plan = [("images", "annotations", train_pairs)]

    def ext_of(d, stem):
        for fn in found[d]:
            if _stem(fn) == stem:
                return fn
        return None

    n_total = 0
    for img_dir_name, mask_dir_name, plist in plan:
        img_out = os.path.join(out, img_dir_name)
        mask_out = os.path.join(out, mask_dir_name)
        os.makedirs(img_out, exist_ok=True)
        os.makedirs(mask_out, exist_ok=True)
        placed = set()
        for d, m, stems in plist:
            # multiple source dir pairs flatten into one output dir
            # (e.g. DAGM Class1..Class10): prefix each pair's files with
            # its source-relative tag so same-stem files from different
            # classes cannot silently overwrite each other
            tag = "" if len(plist) == 1 else _dir_tag(d, source) + "_"
            for s in stems:
                fi, fm = ext_of(d, s), ext_of(m, s)
                # destination stem must be dot-free: the training
                # pipeline derives stems by first-dot split
                safe = (tag + s).replace(".", "_")
                if safe in placed:
                    sys.exit(f"ERROR: destination name collision "
                             f"{safe!r} (from {os.path.join(d, fi)}); "
                             f"rename the colliding source files")
                placed.add(safe)
                di = safe + os.path.splitext(fi)[1]
                dm = safe + os.path.splitext(fm)[1]
                _place(os.path.join(d, fi), os.path.join(img_out, di), copy)
                _place(os.path.join(m, fm), os.path.join(mask_out, dm), copy)
                n_total += 1
    print(f"ingested {n_total} image/mask pairs -> {out}")
    validate(dataset, root)


def _read_gray(path: str):
    import cv2
    return cv2.imread(path, cv2.IMREAD_GRAYSCALE)


def validate(dataset: str, root: str) -> bool:
    """Layout + content pre-flight. Returns True when trainable."""
    import numpy as np
    info = DATASETS[dataset]
    base = os.path.join(root, dataset)
    img_dir = os.path.join(base, "images")
    mask_dir = os.path.join(base, "annotations")
    ok = True

    def fail(msg):
        nonlocal ok
        ok = False
        print(f"  FAIL  {msg}")

    print(f"[{dataset}] validating {base}")
    if not os.path.isdir(img_dir) or not os.path.isdir(mask_dir):
        fail(f"missing {img_dir} and/or {mask_dir}")
        print(f"  hint: python scripts/prepare_data.py ingest "
              f"--dataset {dataset} --source <RAWDIR>")
        return False

    stems_i = {_stem(f) for f in os.listdir(img_dir)}
    stems_m = {_stem(f) for f in os.listdir(mask_dir)}
    if not stems_i:
        fail("no images found")
        return False
    missing = stems_i - stems_m
    if missing:
        fail(f"{len(missing)} images without masks (e.g. "
             f"{sorted(missing)[:3]})")
    print(f"  {len(stems_i)} train images, {len(stems_m)} masks")

    # decode + label-range spot check
    import itertools
    bad_labels = 0
    for s in itertools.islice(sorted(stems_i & stems_m), 5):
        m = None
        for fn in os.listdir(mask_dir):
            if _stem(fn) == s:
                m = _read_gray(os.path.join(mask_dir, fn))
                break
        if m is None:
            fail(f"unreadable mask for {s}")
            continue
        vals = set(np.unique(m).tolist())
        if dataset == "kosdd2":
            vals = {v // 255 for v in vals}  # (mask/255).long() semantics
        if not vals <= set(range(info["classes"])):
            bad_labels += 1
    if bad_labels:
        fail(f"{bad_labels}/5 sampled masks have labels outside "
             f"0..{info['classes'] - 1}")

    # split dry-run through the real split chain
    try:
        from uaps_tpu.data.specs import SPECS, split_ids
        spec = SPECS[dataset]
        test_dir = os.path.join(base, "test_images")
        test_ids = (sorted({_stem(f) for f in os.listdir(test_dir)})
                    if os.path.isdir(test_dir) else None)
        if info["has_test_dir"] and test_ids is None:
            print("  WARN  no test_images/ dir — golden eval will reuse "
                  "the val split")
        splits = split_ids(spec, sorted(stems_i & stems_m), test_ids,
                           0.15 if dataset == "neu" else 0.20,
                           0.10 if dataset in ("neu", "dagm") else 0.40,
                           69, 45)
        print(f"  splits: labeled={len(splits['labeled'])} "
              f"unlabeled={len(splits['unlabeled'])} "
              f"val={len(splits['val'])} test={len(splits['test'])}")
    except Exception as e:  # pragma: no cover
        fail(f"split chain error: {e}")

    if ok:
        extra = ""
        if os.path.isdir(os.path.join(base, "test_images")):
            extra = (f" --test_image_root {base}/test_images"
                     f" --test_mask_root {base}/test_annotations")
        print(f"  OK — train with:\n"
              f"    python -m uaps_tpu.train --preset {info['preset']} "
              f"--method uaps --image_root {img_dir} "
              f"--mask_root {mask_dir}{extra} --dtype bfloat16 "
              f"--out_dir runs/{dataset}\n"
              f"  golden eval (target {info['golden']}):\n"
              f"    python -m uaps_tpu.eval --preset {info['preset']} "
              f"--method uaps --image_root {img_dir} "
              f"--mask_root {mask_dir}{extra} --out_dir runs/{dataset}")
    return ok


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("command", choices=["ingest", "validate"])
    p.add_argument("--dataset", choices=sorted(DATASETS))
    p.add_argument("--all", action="store_true",
                   help="validate every dataset found under --root")
    p.add_argument("--source", help="raw downloaded directory (ingest)")
    p.add_argument("--root", default=DEFAULT_ROOT,
                   help=f"conventional data root (default {DEFAULT_ROOT})")
    p.add_argument("--copy", action="store_true",
                   help="copy files instead of symlinking")
    a = p.parse_args(argv)

    if a.command == "ingest":
        if not (a.dataset and a.source):
            p.error("ingest needs --dataset and --source")
        ingest(a.dataset, a.source, a.root, copy=a.copy)
        return
    if a.dataset and not a.all:
        # explicit dataset: validate it even if absent (show the failure)
        results = {a.dataset: validate(a.dataset, a.root)}
    else:
        # --all, or bare `validate`: check whatever is provisioned
        results = {d: validate(d, a.root) for d in sorted(DATASETS)
                   if os.path.isdir(os.path.join(a.root, d))}
        if not results:
            print(f"no datasets found under {a.root}")
    if not all(results.values()):
        sys.exit(1)


if __name__ == "__main__":
    main()
