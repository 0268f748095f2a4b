"""Async batching server tests (uaps_tpu/server.py).

Covers the dynamic-batching dispatcher (request coalescing, result
correctness vs the direct engine, error propagation, shutdown) and the
stdlib HTTP front. CPU-only, tiny shapes.
"""
import dataclasses
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from uaps_tpu.methods import get_method
from uaps_tpu.serve import InferenceEngine
from uaps_tpu.server import AsyncBatcher, serve_http
from uaps_tpu.utils.config import preset


@pytest.fixture(scope="module")
def engine():
    cfg = preset("synthetic", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                   batch_size=4)
    method = get_method("uaps")
    state, _ = method.init_state(cfg, jax.random.key(0))
    return cfg, InferenceEngine(cfg, params=state.params,
                                batch_stats=state.batch_stats)


@pytest.fixture()
def batcher(engine):
    _, eng = engine
    b = AsyncBatcher(eng, max_wait_ms=20.0)
    yield b
    b.shutdown()


class TestAsyncBatcher:
    def test_results_match_direct_engine(self, engine, batcher):
        _, eng = engine
        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 255, (5, 32, 32, 3)).astype(np.uint8)
        futs = [batcher.submit(im) for im in imgs]
        got = np.stack([f.result(timeout=120)[0] for f in futs])
        direct, _ = eng.predict(imgs)
        np.testing.assert_array_equal(got, direct)

    def test_burst_coalesces_into_batches(self, engine, batcher):
        """A concurrent burst must land in fewer dispatches than requests
        (dynamic batching actually batching)."""
        rng = np.random.default_rng(1)
        imgs = rng.integers(0, 255, (8, 32, 32, 3)).astype(np.uint8)
        futs = []
        barrier = threading.Barrier(8)

        def fire(im):
            barrier.wait()
            futs.append(batcher.submit(im))

        threads = [threading.Thread(target=fire, args=(im,))
                   for im in imgs]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for f in list(futs):
            f.result(timeout=120)
        s = batcher.stats()
        assert s["requests"] == 8
        assert s["dispatches"] < 8
        assert s["mean_batch_occupancy"] > 1.0
        assert s["p99_ms"] >= s["p50_ms"] > 0

    def test_error_propagates_to_future(self, engine):
        _, eng = engine
        b = AsyncBatcher(eng, max_wait_ms=1.0)
        try:
            fut = b.submit(np.zeros((7, 9, 3), np.uint8))  # bad shape
            with pytest.raises(Exception):
                fut.result(timeout=120)
        finally:
            b.shutdown()

    def test_shutdown_fails_stragglers(self, engine):
        _, eng = engine
        import concurrent.futures
        b = AsyncBatcher(eng, max_wait_ms=1.0)
        b._stop.set()           # dispatcher will exit its loop...
        b._thread.join(10.0)    # ...wait until it actually has
        f = concurrent.futures.Future()
        b._q.put((np.zeros((32, 32, 3), np.uint8), f, 0.0))
        b.shutdown()            # must fail the straggler, not hang it
        with pytest.raises(RuntimeError):
            f.result(timeout=5)


class TestHTTPServer:
    def test_predict_health_stats(self, engine, batcher):
        srv = serve_http(batcher, port=0)  # ephemeral port
        port = srv.server_address[1]
        base = f"http://127.0.0.1:{port}"
        try:
            assert urllib.request.urlopen(
                base + "/healthz", timeout=30).read() == b"ok"
            img = np.random.default_rng(2).integers(
                0, 255, (32, 32, 3)).astype(np.uint8)
            buf = io.BytesIO()
            np.save(buf, img)
            req = urllib.request.Request(
                base + "/predict", data=buf.getvalue(), method="POST")
            mask = np.load(io.BytesIO(
                urllib.request.urlopen(req, timeout=120).read()),
                allow_pickle=False)
            assert mask.shape == (32, 32) and mask.dtype == np.int32
            stats = json.loads(urllib.request.urlopen(
                base + "/stats", timeout=30).read())
            assert stats["requests"] >= 1
            # batch of 3 in one POST
            imgs = np.random.default_rng(3).integers(
                0, 255, (3, 32, 32, 3)).astype(np.uint8)
            buf = io.BytesIO()
            np.save(buf, imgs)
            req = urllib.request.Request(
                base + "/predict", data=buf.getvalue(), method="POST")
            masks = np.load(io.BytesIO(
                urllib.request.urlopen(req, timeout=120).read()),
                allow_pickle=False)
            assert masks.shape == (3, 32, 32)
            # malformed body -> 400
            req = urllib.request.Request(
                base + "/predict", data=b"not-npy", method="POST")
            with pytest.raises(urllib.error.HTTPError) as ei:
                urllib.request.urlopen(req, timeout=30)
            assert ei.value.code == 400
        finally:
            srv.shutdown()
