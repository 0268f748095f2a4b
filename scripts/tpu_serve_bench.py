"""Serving-latency headline (VERDICT r3 #6) -> BENCH_serve_r{N}.json.

Methodology (replaces the reference's bs=1 notebook sweep,
UAPS-Testing.ipynb cells 11-19):
  * single-image p50/p99: InferenceEngine(batch_size=1).predict per
    image, wall-clock around the full call (normalize + H2D + jitted
    forward + D2H argmax) — through the tunneled relay this is
    dominated by the ~5 ms dispatch + round-trip, recorded as-is with
    the methodology noted in the JSON.
  * batched-server throughput: AsyncBatcher over a bs=16 engine, 512
    requests from 16 client threads; stats() gives rps + p50/p99 and
    mean batch occupancy.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_serve_bench.py [out.json]
"""
import dataclasses
import json
import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402

from uaps_tpu.methods import get_method  # noqa: E402
from uaps_tpu.serve import InferenceEngine  # noqa: E402
from uaps_tpu.server import AsyncBatcher  # noqa: E402
from uaps_tpu.utils.config import preset  # noqa: E402


def main():
    assert jax.devices()[0].platform == "tpu"
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_serve_r04.json"
    cfg = preset("neu", method="uaps")
    cfg.model = dataclasses.replace(cfg.model, compute_dtype="bfloat16")
    rng = np.random.default_rng(0)
    imgs = (rng.random((64, 256, 256, 3)) * 255).astype(np.uint8)

    # no trained checkpoint exists in this environment: serve freshly-
    # initialized weights (latency is weight-value independent)
    state0, _ = get_method("uaps").init_state(cfg, jax.random.key(0))
    weights = dict(params=state0.params, batch_stats=state0.batch_stats)

    # ---- single-image latency (bs=1 engine, like the notebooks) ----
    eng1 = InferenceEngine(cfg, batch_size=1, **weights)
    eng1.predict(imgs[:1])  # compile
    lat = []
    for i in range(64):
        t0 = time.perf_counter()
        seg, conf = eng1.predict(imgs[i % 64:i % 64 + 1])
        assert seg.shape[0] == 1
        lat.append(time.perf_counter() - t0)
    lat = np.asarray(lat)
    single = {"p50_ms": float(np.percentile(lat, 50) * 1e3),
              "p99_ms": float(np.percentile(lat, 99) * 1e3),
              "mean_ms": float(lat.mean() * 1e3)}
    print("single-image:", single, flush=True)

    # ---- batched server throughput ----
    eng = InferenceEngine(cfg, batch_size=16, **weights)
    eng.predict(imgs[:16])  # compile
    batcher = AsyncBatcher(eng)
    n_req = 512

    def client(k):
        return batcher.submit(imgs[k % 64]).result()

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=16) as ex:
        list(ex.map(client, range(n_req)))
    wall = time.perf_counter() - t0
    stats = batcher.stats()
    batcher.shutdown()
    print("batched:", stats, f"wall {wall:.2f}s", flush=True)

    out = {
        "metric": "uaps_serving",
        "config": "unet_uaps NEU 256x256 bf16, main-decoder predict",
        "single_image": single,
        "batched_server": {k: round(v, 3) if isinstance(v, float) else v
                          for k, v in stats.items()},
        "note": ("measured through the tunneled single-chip relay: "
                 "single-image latency is relay-round-trip dominated "
                 "(~5 ms/dispatch + HTTP); on-chip eval compute is "
                 "6.4 ms at bs16 (PERF.md) ≈ 0.4 ms/img"),
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
