"""Full-length production-shape training run (VERDICT r2 #1b).

The reference trains 800 epochs x 60 iters at 256x256, bs 16+16
(/root/reference/UAPS_train.py:66,78,127) with sigmoid ramps over
epoch = iter//80 (rampup 200 -> the consistency weights only saturate
~16k steps in) and ReduceLROnPlateau(patience 50) on val mDice. No
prior run has operated those schedules in-regime. This script runs the
faithful schedule on NEU-shaped synthetic pools (real NEU images are
not available in this environment — BASELINE.md addendum):

  labeled 120 imgs (10% of a 1200-image train pool, like NEU's 10%),
  unlabeled 1080, val 176, test 240 — all fixed pools, 256x256, 4 cls.

Usage (background, TPU):
  PYTHONPATH=/root/.axon_site:/root/repo python scripts/quality_run.py \
      <method: baseline|uaps> [epochs] [out_dir]

Writes per-epoch JSONL curves to <out_dir>/metrics.jsonl and prints a
final RESULT line with best val mDice + held-out test metrics of the
best checkpoint. Results tabulated in docs/QUALITY.md.
"""
import dataclasses
import json
import sys
import time

import jax

if "--smoke" in sys.argv:
    # CPU sanity mode: must flip platforms BEFORE first device use — the
    # axon PJRT plugin overrides the JAX_PLATFORMS env var (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import numpy as np

sys.path.insert(0, "/root/repo")

from uaps_tpu.train import Trainer  # noqa: E402
from uaps_tpu.utils.config import preset  # noqa: E402
from uaps_tpu.data.synthetic import SyntheticDefects  # noqa: E402

LABELED, UNLABELED, VAL, TEST = 120, 1080, 176, 240


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    smoke = "--smoke" in sys.argv   # tiny CPU sanity pass of this script
    method = args[0] if args else "uaps"
    epochs = int(args[1]) if len(args) > 1 else (3 if smoke else 800)
    out = args[2] if len(args) > 2 else f"runs/quality_{method}"

    size = (64, 64) if smoke else (256, 256)
    pools = (24, 64, 32, 32) if smoke else (LABELED, UNLABELED, VAL, TEST)
    cfg = preset("synthetic", method=method)
    cfg.data = dataclasses.replace(cfg.data, image_size=size,
                                   batch_size=16)
    cfg.model = dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    # faithful schedule: 800x60 steps, ramps + plateau in-regime.
    # device_pools: the relay's upload bandwidth caps host-fed 256²
    # training at ~10 imgs/s; resident pools run the epoch on-device.
    cfg.run = dataclasses.replace(cfg.run, epochs=epochs,
                                  iter_per_epoch=6 if smoke else 60,
                                  out_dir=out, seed=1337,
                                  device_pools=True)

    t0 = time.time()
    print(f"generating HARD pools ({pools} imgs @{size})...", flush=True)
    data = SyntheticDefects(cfg.data, seed=cfg.run.seed, hard=True,
                            labeled_pool=pools[0], unlabeled_pool=pools[1],
                            val_pool=pools[2], test_pool=pools[3])
    print(f"pools ready in {time.time() - t0:.0f}s", flush=True)

    trainer = Trainer(cfg, data=data)
    best = trainer.run(resume=("--resume" in sys.argv))

    # held-out test sweep with the BEST checkpoint (the keep-best gate
    # means latest == best; reference protocol = notebook test sweep)
    trainer.maybe_resume()
    sums, n = {}, 0
    for batch in data.test_iter():
        m = jax.device_get(trainer.eval_step(
            trainer.state.params, trainer.state.batch_stats,
            jax.device_put(batch)))
        for k, v in m.items():
            sums[k] = sums.get(k, 0.0) + float(v)
        n += 1
    test = {k: v / n for k, v in sums.items()}
    result = {"method": method, "epochs": epochs,
              "best_val_mdice": round(float(best), 4),
              "test_mdice": round(test["val_mdice"], 4),
              "test_miou": round(test["val_miou"], 4),
              "test_acc": round(test["val_acc"], 4),
              "wall_hours": round((time.time() - t0) / 3600, 2)}
    print("RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
