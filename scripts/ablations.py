"""Labeled-ratio + n_aux ablation matrix (VERDICT r2 #7).

The paper's ablations (BASELINE.json configs; the decoder-effect figure
/root/reference/fig_data/decoder-effect.jpg plots quality + inference
time vs number of aux decoders):
  - labeled fraction {5, 10, 20, 40}% x {baseline, uaps}
  - n_aux in {2, 3, 4} at 10% labeled (+ full-forward latency column)

Runs everything in ONE process (same shapes reuse jit signatures — the
relay compile costs 100-260s each) on 64x64 synthetic pools with the
round-1 ssl_compare recipe (30 epochs x 25 iters, bf16). A 240-image
train pool makes fraction f a labeled pool of 240*f images.

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python scripts/ablations.py
Emits one RESULT json line per leg; table lives in docs/QUALITY.md.
"""
import dataclasses
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.train import Trainer  # noqa: E402
from uaps_tpu.utils.config import preset  # noqa: E402
from uaps_tpu.data.synthetic import SyntheticDefects  # noqa: E402

import os

TRAIN_POOL = 240
FRACTIONS = (0.05, 0.10, 0.20, 0.40)
# 30x25 steps (round-1 ssl_compare's easy-pool recipe) was far too short
# Calibration history (r3c, measured — don't re-walk): HARD pools at
# 64px are degenerate for this matrix at ANY schedule — with 24 labeled
# images the model memorizes (train dice 0.9999) while val mDice decays
# to ~0.01 (best ~0.05) whether trained 30x25 or 250x25 steps; no axis
# can differentiate down there. EASY pools at 64px are the regime where
# the SSL effect measurably separates methods (r1 ssl_compare: baseline
# 0.7978 vs uaps 0.8515 at 24 labels) without saturating, so the matrix
# runs easy pools; the HARD production-scale evidence lives in
# quality_run.py at 256² (docs/QUALITY.md §b).
EPOCHS = int(os.environ.get("UAPS_ABL_EPOCHS", "40"))
ITERS = 25


def run_leg(method: str, labeled: int, n_aux: int = 3) -> dict:
    cfg = preset("synthetic", method=method)
    cfg.data = dataclasses.replace(cfg.data, image_size=(64, 64),
                                   batch_size=16)
    cfg.model = dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                    n_aux=n_aux)
    cfg.run = dataclasses.replace(
        cfg.run, epochs=EPOCHS, iter_per_epoch=ITERS, seed=1337,
        device_pools=True,
        out_dir=f"runs/abl_{method}_l{labeled}_a{n_aux}")
    # fixed train pool of TRAIN_POOL images split labeled/unlabeled like
    # the reference's sklearn split; EASY rendering — see the calibration
    # note above (hard@64px is degenerate for every leg)
    data = SyntheticDefects(cfg.data, seed=cfg.run.seed,
                            labeled_pool=labeled,
                            unlabeled_pool=TRAIN_POOL - labeled,
                            val_pool=64)
    t = Trainer(cfg, data=data)
    best = t.run()

    # full-forward latency (all decoders; the decoder-effect figure's
    # x-axis is decoder count, its cost axis is inference time)
    lat = None
    if method == "uaps":
        x = jax.device_put(np.zeros((1, 64, 64, 3), np.float32))
        fwd = jax.jit(lambda p, bs, v: t.model.apply(
            {"params": p, "batch_stats": bs}, v, train=False,
            rngs={"perturb": jax.random.key(0)}))
        outs = fwd(t.state.params, t.state.batch_stats, x)
        float(np.asarray(outs[0]).ravel()[0])  # fence (relay-safe)
        t0 = time.perf_counter()
        for _ in range(20):
            outs = fwd(t.state.params, t.state.batch_stats, x)
        float(np.asarray(outs[0]).ravel()[0])
        lat = (time.perf_counter() - t0) / 20 * 1000
    return {"method": method, "labeled": labeled, "n_aux": n_aux,
            "best_val_mdice": round(float(best), 4),
            "full_fwd_ms": round(lat, 2) if lat else None}


def main():
    if "probe" in sys.argv:
        # calibration probe: the 10% pair only — verifies the schedule
        # differentiates methods before paying the full sweep's compiles
        for method in ("baseline", "uaps"):
            r = run_leg(method, int(TRAIN_POOL * 0.10))
            r["fraction"] = 0.10
            print("RESULT " + json.dumps(r), flush=True)
        return
    results = []
    for frac in FRACTIONS:                       # labeled-ratio matrix
        labeled = int(TRAIN_POOL * frac)
        for method in ("baseline", "uaps"):
            r = run_leg(method, labeled)
            r["fraction"] = frac
            print("RESULT " + json.dumps(r), flush=True)
            results.append(r)
    for n_aux in (2, 4):                         # n_aux (3 done above)
        r = run_leg("uaps", int(TRAIN_POOL * 0.10), n_aux=n_aux)
        print("RESULT " + json.dumps(r), flush=True)
        results.append(r)
    print("ALL " + json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
