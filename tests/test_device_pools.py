"""Device-resident pool training path (data/device_pool.py).

The relay-fed TPU host can't stream 256² batches (CLAUDE.md / PERF.md
r3); RunConfig.device_pools folds sampling + the whole epoch into one
jitted scan over HBM-resident pools. These tests pin (a) the Trainer
integration end-to-end, (b) exact agreement between the jitted pool
val-sweep and the host-fed validate() path, (c) resume determinism of
the epoch key schedule.
"""
import dataclasses

import numpy as np
import pytest

import jax

from uaps_tpu.data.synthetic import SyntheticDefects
from uaps_tpu.train import Trainer
from uaps_tpu.utils.config import preset


def _cfg(method="uaps", **run_kw):
    cfg = preset("synthetic", method=method)
    cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                   batch_size=8)
    cfg.run = dataclasses.replace(cfg.run, epochs=2, iter_per_epoch=3,
                                  seed=11, device_pools=True, **run_kw)
    return cfg


def _data(cfg, **kw):
    kw.setdefault("labeled_pool", 8)
    kw.setdefault("unlabeled_pool", 16)
    kw.setdefault("val_pool", 16)
    return SyntheticDefects(cfg.data, seed=cfg.run.seed, **kw)


class TestDevicePools:
    def test_trainer_runs_and_learns(self, tmp_path):
        cfg = _cfg(out_dir=str(tmp_path))
        t = Trainer(cfg, num_devices=1, data=_data(cfg))
        assert t.device_pools and t._val_sweep is not None
        best = t.run()
        assert np.isfinite(best) and best >= 0

    def test_val_sweep_matches_host_path(self, tmp_path):
        """Same weights, same fixed val pool -> the jitted scan sweep and
        the host-fed validate() must agree (sequential slices, plain
        batch mean on both sides)."""
        cfg = _cfg("baseline", out_dir=str(tmp_path))
        t = Trainer(cfg, num_devices=1, data=_data(cfg))
        dev = t.validate()
        sweep, t._val_sweep = t._val_sweep, None   # force host path
        host = t.validate()
        t._val_sweep = sweep
        for k in host:
            np.testing.assert_allclose(dev[k], host[k], rtol=2e-5,
                                       atol=1e-6, err_msg=k)

    def test_epoch_keys_deterministic_for_resume(self, tmp_path):
        """Two trainers, same seed: epoch batches derive from
        fold_in(seed, epoch) only, so trajectories are identical."""
        cfg = _cfg(out_dir=str(tmp_path / "a"))
        t1 = Trainer(cfg, num_devices=1, data=_data(cfg))
        t1.run()
        cfg2 = dataclasses.replace(
            cfg, run=dataclasses.replace(cfg.run,
                                         out_dir=str(tmp_path / "b")))
        t2 = Trainer(cfg2, num_devices=1, data=_data(cfg2))
        t2.run()
        p1 = jax.device_get(t1.state.params)
        p2 = jax.device_get(t2.state.params)
        jax.tree.map(np.testing.assert_allclose, p1, p2)

    @pytest.mark.parametrize("method", ["mt", "ucc"])
    def test_other_methods(self, tmp_path, method):
        cfg = _cfg(method, out_dir=str(tmp_path))
        t = Trainer(cfg, num_devices=1, data=_data(cfg))
        assert t.device_pools
        best = t.run()
        assert np.isfinite(best)

    def test_disabled_without_pools(self, tmp_path):
        cfg = _cfg(out_dir=str(tmp_path))
        t = Trainer(cfg, num_devices=1, data=SyntheticDefects(cfg.data, seed=1))
        assert not t.device_pools


class TestHardMode:
    def test_hard_batches_valid(self):
        from uaps_tpu.data.synthetic import synthetic_batch
        rng = np.random.default_rng(0)
        b = synthetic_batch(rng, 4, (64, 64), 4, 3, hard=True)
        assert b["image"].shape == (4, 64, 64, 3)
        assert b["image"].min() >= 0 and b["image"].max() <= 1
        assert set(np.unique(b["label"])) <= set(range(4))
        # hard mode must still contain defects to learn
        assert (b["label"] > 0).mean() > 0.002
