"""End-to-end method tests on synthetic data (SURVEY.md §4c-e).

Covers: single-step mechanics (finite loss, grads applied, state evolves),
multi-step learning signal (loss decreases), sharded-vs-single-device
equivalence (the TPU-pod test without a pod), and the full Trainer loop
with checkpoint/resume.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uaps_tpu.data.synthetic import SyntheticDefects
from uaps_tpu.methods import get_method, base as mbase
from uaps_tpu.parallel import make_mesh, replicate_state, shard_batch
from uaps_tpu.utils.config import preset


def tiny_cfg(method="uaps", **run_kw):
    import dataclasses
    cfg = preset("synthetic", method=method)
    cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                   batch_size=8)
    cfg.run = dataclasses.replace(cfg.run, **run_kw) if run_kw else cfg.run
    return cfg


def make_batch(cfg, seed=0):
    data = SyntheticDefects(cfg.data, seed=seed)
    return next(iter(data.train_iter()))


@pytest.mark.parametrize("method_name", ["baseline", "uaps"])
class TestTrainStep:
    def test_single_step(self, method_name):
        cfg = tiny_cfg(method_name)
        method = get_method(method_name)
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = jax.jit(method.make_train_step(cfg, model, tx))
        batch = make_batch(cfg)
        p0 = jax.tree.leaves(state.params)[0].copy()
        new_state, metrics = step(state, batch)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["loss"]))
        # params actually moved
        p1 = jax.tree.leaves(new_state.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))
        # PRNG key advanced
        assert not np.array_equal(
            jax.random.key_data(state.key), jax.random.key_data(new_state.key))

    def test_loss_decreases(self, method_name):
        cfg = tiny_cfg(method_name)
        method = get_method(method_name)
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = jax.jit(method.make_train_step(cfg, model, tx))
        data = SyntheticDefects(cfg.data, seed=1)
        losses = []
        stream = data.train_iter()
        for i in range(12):
            state, metrics = step(state, next(stream))
            losses.append(float(metrics["loss"]))
        assert np.mean(losses[-4:]) < np.mean(losses[:4]), losses


class TestUAPSSemantics:
    def test_metrics_contain_uaps_terms(self):
        cfg = tiny_cfg("uaps")
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = jax.jit(method.make_train_step(cfg, model, tx))
        _, metrics = step(state, make_batch(cfg))
        for k in ["sup_loss", "ps_loss", "uncertainty_loss",
                  "consistency_w1", "consistency_w2"]:
            assert k in metrics and np.isfinite(float(metrics[k])), k

    def test_ramp_weight_grows(self):
        cfg = tiny_cfg("uaps")
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = jax.jit(method.make_train_step(cfg, model, tx))
        batch = make_batch(cfg)
        _, m0 = step(state, batch)
        # jump the step counter far ahead -> weight ~ consistency1
        state_late = state.replace(step=jnp.asarray(80 * 1000, jnp.int32))
        _, m1 = step(state_late, batch)
        assert float(m1["consistency_w1"]) > float(m0["consistency_w1"])
        np.testing.assert_allclose(float(m1["consistency_w1"]),
                                   cfg.method.consistency1, rtol=1e-5)

    def test_ablation_flags(self):
        import dataclasses
        cfg = tiny_cfg("uaps")
        cfg.method = dataclasses.replace(
            cfg.method, dynamic_mixing=False, uncertainty_gate=False)
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = jax.jit(method.make_train_step(cfg, model, tx))
        _, metrics = step(state, make_batch(cfg))
        assert np.isfinite(float(metrics["loss"]))

    def test_n_aux_2(self):
        import dataclasses
        cfg = tiny_cfg("uaps")
        cfg.model = dataclasses.replace(cfg.model, n_aux=2)
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = jax.jit(method.make_train_step(cfg, model, tx))
        _, metrics = step(state, make_batch(cfg))
        assert np.isfinite(float(metrics["loss"]))


class TestShardingEquivalence:
    """SURVEY §4e: sharded-vs-single-device step equivalence on the 8-dev
    CPU mesh — how TPU-pod behavior is tested without a pod."""

    def _run(self, n_devices):
        cfg = tiny_cfg("uaps")
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = jax.jit(method.make_train_step(cfg, model, tx))
        mesh = make_mesh(n_devices)
        state = replicate_state(state, mesh)
        batch = shard_batch(make_batch(cfg), mesh)
        new_state, metrics = step(state, batch)
        return jax.device_get(new_state.params), jax.device_get(metrics)

    def test_8dev_matches_1dev(self, devices):
        p1, m1 = self._run(1)
        p8, m8 = self._run(8)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=5e-3)
        flat1 = jax.tree.leaves(p1)
        flat8 = jax.tree.leaves(p8)
        # Adam normalizes the gradient, so reduction-order noise on a
        # near-zero gradient coordinate can flip its update sign: per-coord
        # differences are bounded by ~2*lr. Assert within that envelope.
        lr = 1e-3
        for a, b in zip(flat1, flat8):
            np.testing.assert_allclose(a, b, rtol=2e-2, atol=2.5 * lr)

    def test_grad_level_equivalence(self, devices):
        """PRE-optimizer equivalence: with unit-lr SGD the param delta IS
        the gradient, so 1-dev vs 8-dev agreement checks the sharded
        backward directly (no Adam sign-flip involved).

        Calibration of the tolerances (measured in this rig, r2): the
        BN-train U-Net gradient is CHAOTIC at float32 scale — a 1e-7
        relative input jitter changes the global gradient vector by
        4.5e-4 (each train-mode BatchNorm's rsqrt(batch var) multiplies
        reduction-order noise into everything downstream, compounding
        across 18 BNs both directions of autodiff). Different shardings
        reorder reductions at the ~1e-7 level, which legitimately yields
        ~1e-2 global grad differences (loss values still agree to 6e-7;
        eval-mode grads agree to 7e-7). So: LOSS pinned tight, gradient
        vector bounded at the measured chaos floor — far inside the old
        2.5x-lr-per-coordinate Adam envelope, and any real sharding bug
        (wrong pmean, missing term) lands orders of magnitude above it."""
        import optax

        def run(n_devices):
            cfg = tiny_cfg("baseline")
            method = get_method("baseline")
            state, model = method.init_state(cfg, jax.random.key(0))
            tx = optax.sgd(learning_rate=1.0)
            state = state.replace(opt_state=tx.init(state.params))
            step = jax.jit(method.make_train_step(cfg, model, tx))
            mesh = make_mesh(n_devices)
            state = replicate_state(state, mesh)
            p0 = jax.device_get(state.params)
            batch = shard_batch(make_batch(cfg), mesh)
            new_state, metrics = step(state, batch)
            p1 = jax.device_get(new_state.params)
            grads = jax.tree.map(
                lambda a, b: np.asarray(a) - np.asarray(b), p0, p1)
            return grads, float(metrics["loss"])

        g1, l1 = run(1)
        g8, l8 = run(8)
        np.testing.assert_allclose(l1, l8, rtol=1e-5)
        flat1 = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g1)])
        flat8 = np.concatenate([np.ravel(l) for l in jax.tree.leaves(g8)])
        rel = (np.linalg.norm(flat1 - flat8)
               / (np.linalg.norm(flat1) + 1e-12))
        assert rel < 2e-2, rel


class TestTrainerLoop:
    def test_trainer_end_to_end_with_resume(self, tmp_path):
        from uaps_tpu.train import Trainer
        import dataclasses
        cfg = tiny_cfg("uaps")
        cfg.run = dataclasses.replace(
            cfg.run, epochs=2, iter_per_epoch=3, out_dir=str(tmp_path))
        t = Trainer(cfg)
        best = t.run()
        assert best > 0
        assert os.path.exists(tmp_path / "metrics.jsonl")
        assert t.ckpt.latest_step() is not None
        # resume: continues from saved epoch without error
        cfg2 = dataclasses.replace(
            cfg, run=dataclasses.replace(cfg.run, epochs=3))
        t2 = Trainer(cfg2)
        start = t2.maybe_resume()
        assert start >= 1
        assert int(jax.device_get(t2.state.step)) >= 3

    def test_eval_step_protocol(self):
        cfg = tiny_cfg("uaps")
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        eval_step = mbase.make_eval_step(cfg, model)
        batch = make_batch(cfg)
        m = eval_step(state.params, state.batch_stats, batch)
        for k in ["val_loss", "val_miou", "val_mdice", "val_acc"]:
            assert np.isfinite(float(m[k])), k


class TestPlateauScheduler:
    def test_reduces_after_patience(self):
        import dataclasses
        cfg = tiny_cfg("baseline")
        cfg.optim = dataclasses.replace(cfg.optim, plateau_patience=2)
        method = get_method("baseline")
        state, model = method.init_state(cfg, jax.random.key(0))
        sched = mbase.PlateauScheduler(cfg.optim)
        lr0 = mbase.get_lr(state)
        state = sched.step(state, 0.5)   # best
        for _ in range(3):               # 3 bad epochs > patience 2
            state = sched.step(state, 0.4)
        assert mbase.get_lr(state) == pytest.approx(lr0 * 0.1)


class TestFusedBatch:
    def test_fused_batch_step(self):
        import dataclasses
        cfg = tiny_cfg("uaps")
        cfg.method = dataclasses.replace(cfg.method, fused_batch=True)
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = jax.jit(method.make_train_step(cfg, model, tx))
        new_state, metrics = step(state, make_batch(cfg))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == 1


class TestSpatialSharding:
    """The CP analog (SURVEY §5.7): image-H sharding with GSPMD halo
    exchange; must be bit-compatible with the unsharded forward and the
    train step must match across mesh shapes."""

    def test_forward_equivalence(self, devices):
        from jax.sharding import NamedSharding, PartitionSpec as P
        from uaps_tpu.models import net_factory
        m = net_factory("unet", class_num=4)
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (2, 64, 64, 3)), jnp.float32)
        v = m.init({"params": jax.random.key(0),
                    "dropout": jax.random.key(1),
                    "perturb": jax.random.key(2)}, x, train=False)
        f = jax.jit(lambda vv, xx: m.apply(vv, xx, train=False))
        ref = np.asarray(f(v, x))
        mesh = make_mesh(4, spatial=4)
        xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial")))
        vs = replicate_state(v, mesh)
        np.testing.assert_allclose(np.asarray(f(vs, xs)), ref,
                                   rtol=1e-4, atol=1e-4)

    def test_train_step_dp_x_sp(self, devices):
        cfg = tiny_cfg("uaps")
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = jax.jit(method.make_train_step(cfg, model, tx))
        batch = make_batch(cfg)
        mesh1 = make_mesh(1)
        _, m1 = step(replicate_state(state, mesh1),
                     shard_batch(batch, mesh1))
        mesh2 = make_mesh(8, spatial=4)
        _, m2 = step(replicate_state(state, mesh2),
                     shard_batch(batch, mesh2))
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=5e-3)


class TestInferenceEngine:
    def test_predict_and_uncertainty(self, tmp_path):
        import dataclasses
        from uaps_tpu.train import Trainer
        from uaps_tpu.serve import InferenceEngine
        cfg = tiny_cfg("uaps")
        cfg.run = dataclasses.replace(
            cfg.run, epochs=1, iter_per_epoch=2, out_dir=str(tmp_path))
        Trainer(cfg).run()
        engine = InferenceEngine(cfg, str(tmp_path / "checkpoints"),
                                 batch_size=4)
        # 6 uint8 images -> microbatched (4 + padded 2)
        imgs = (np.random.default_rng(0).random((6, 32, 32, 3))
                * 255).astype(np.uint8)
        masks, probs = engine.predict(imgs)
        assert masks.shape == (6, 32, 32)
        assert probs.shape == (6, 32, 32, 4)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-3)
        umaps = engine.uncertainty(imgs)
        assert umaps.shape == (6, 32, 32)
        assert float(umaps.min()) >= -1e-5


class TestShardMapMode:
    def test_matches_gspmd_closely(self, devices):
        from uaps_tpu.parallel.shardmap_step import make_sharded_train_step
        cfg = tiny_cfg("uaps")
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        batch = make_batch(cfg)
        step1 = jax.jit(method.make_train_step(cfg, model, tx))
        _, m1 = step1(state, batch)
        mesh = make_mesh(8)
        stepN = make_sharded_train_step(method, cfg, model, tx, mesh)
        sN, mN = stepN(replicate_state(state, mesh),
                       shard_batch(batch, mesh))
        # per-device BN + decorrelated noise -> approximate agreement
        np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]),
                                   rtol=2e-2)
        assert int(jax.device_get(sN.step)) == 1

    # shard_map is the DEFAULT multi-device path: every method must run
    # under it (VERDICT r1 item 2). UCC is covered separately below with
    # its weak/strong batch.
    @pytest.mark.parametrize("method_name",
                             ["baseline", "mt", "uamt", "cps", "cct",
                              "dct"])
    def test_other_methods_shard_map(self, devices, method_name):
        from uaps_tpu.parallel.shardmap_step import make_sharded_train_step
        cfg = tiny_cfg(method_name)
        method = get_method(method_name)
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        mesh = make_mesh(8)
        stepN = make_sharded_train_step(method, cfg, model, tx, mesh)
        sN, m = stepN(replicate_state(state, mesh),
                      shard_batch(make_batch(cfg), mesh))
        assert np.isfinite(float(m["loss"])), method_name
        assert int(jax.device_get(sN.step)) == 1

    def test_ucc_shard_map_weak_strong(self, devices):
        from uaps_tpu.parallel.shardmap_step import make_sharded_train_step
        cfg = tiny_cfg("ucc")
        method = get_method("ucc")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        mesh = make_mesh(8)
        data = SyntheticDefects(cfg.data, seed=0)
        batch = next(iter(data.train_iter_weak_strong()))
        stepN = make_sharded_train_step(method, cfg, model, tx, mesh)
        _, m = stepN(replicate_state(state, mesh),
                     shard_batch(batch, mesh))
        assert np.isfinite(float(m["loss"]))

    def test_trainer_defaults_to_shard_map_multidevice(self, devices):
        """use_shard_map=None must auto-select shard_map on a >1-device
        mesh, and an explicit False must fall back to GSPMD with XLA
        conv routing."""
        import dataclasses
        from uaps_tpu.train import Trainer
        cfg = tiny_cfg("baseline", out_dir="/tmp/r2_smdefault")
        t = Trainer(cfg)
        assert t.use_shard_map is True
        assert t.cfg.model.conv_backend == "auto"
        cfg2 = tiny_cfg("baseline", out_dir="/tmp/r2_smdefault2",
                        use_shard_map=False)
        t2 = Trainer(cfg2)
        assert t2.use_shard_map is False
        assert t2.cfg.model.conv_backend == "xla"


class TestMultiStepDispatch:
    """K-step lax.scan dispatch must produce identical updates to K
    sequential single-step dispatches (RunConfig.steps_per_dispatch)."""

    def test_scan_equals_sequential(self):
        import dataclasses
        import jax
        import jax.numpy as jnp
        import numpy as np
        from uaps_tpu.data.synthetic import synthetic_batch
        from uaps_tpu.methods import get_method, base as mbase
        from uaps_tpu.utils.config import preset

        cfg = preset("synthetic", method="uaps")
        cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                       batch_size=2)
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        step = method.make_train_step(cfg, model, tx)
        rng = np.random.default_rng(0)
        bs = []
        for _ in range(2):
            b = synthetic_batch(rng, 2, (32, 32), 4, 3)
            bs.append({"image": b["image"], "label": b["label"],
                       "uimage": b["image"], "ulabel": b["label"]})

        s_seq = state
        for b in bs:
            s_seq, m_seq = jax.jit(step)(s_seq, b)

        stacked = jax.tree.map(lambda *xs: np.stack(xs), *bs)

        def multi(s, batches):
            return jax.lax.scan(step, s, batches)

        s_scan, m_scan = jax.jit(multi)(state, stacked)
        # Per-step losses must match tightly. Raw params only loosely:
        # scan changes XLA fusion order, and Adam amplifies ulp-level
        # gradient differences on near-zero-gradient elements to a full
        # +/-lr (1e-3) — benign numerical reordering, not a logic diff.
        assert m_scan["loss"].shape == (2,)
        np.testing.assert_allclose(float(m_seq["loss"]),
                                   float(m_scan["loss"][-1]), rtol=1e-5)
        lr = 1e-3
        for a, b in zip(jax.tree.leaves(s_seq.params),
                        jax.tree.leaves(s_scan.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=3 * lr, rtol=0)


class TestEarlyStopping:
    def test_stops_after_patience_and_persists_counter(self, tmp_path):
        """run.early_stop_patience=2 with a validate() that never improves
        after epoch 1 must stop at epoch 3 (1 best + 2 stale), not run all
        10 epochs; the counter round-trips through the checkpoint."""
        import dataclasses
        from uaps_tpu.train import Trainer
        cfg = tiny_cfg("baseline")
        cfg.run = dataclasses.replace(
            cfg.run, epochs=10, iter_per_epoch=2, out_dir=str(tmp_path),
            early_stop_patience=2)
        t = Trainer(cfg)
        calls = []

        def fake_validate():
            calls.append(1)
            # epoch 1 improves (0.5), everything after is worse
            d = 0.5 if len(calls) == 1 else 0.4
            return {"val_mdice": d, "val_miou": d, "val_acc": d}

        t.validate = fake_validate
        t.run()
        assert len(calls) == 3          # stopped, didn't run 10 epochs
        assert t.epochs_since_best == 2
        # counter persisted with the best checkpoint (epoch 1 -> 0)
        t2 = Trainer(cfg)
        t2.maybe_resume()
        assert t2.epochs_since_best == 0
        assert t2.best_dice == pytest.approx(0.5)

    def test_disabled_by_default(self, tmp_path):
        import dataclasses
        from uaps_tpu.train import Trainer
        cfg = tiny_cfg("baseline")
        cfg.run = dataclasses.replace(
            cfg.run, epochs=4, iter_per_epoch=2, out_dir=str(tmp_path))
        t = Trainer(cfg)
        calls = []

        def fake_validate():
            calls.append(1)
            return {"val_mdice": 0.1, "val_miou": 0.1, "val_acc": 0.1}

        t.validate = fake_validate
        t.run()
        assert len(calls) == 4          # patience 0 -> all epochs run


@pytest.mark.slow
class TestMultiChipConvergence:
    """Multi-STEP multi-chip quality equivalence (VERDICT r2 #5).

    The 1-step shard_map-vs-GSPMD check above (rtol 2e-2) says nothing
    about whether the per-device-BN fork (shard_map default, documented
    in docs/ARCHITECTURE.md) converges to the same quality as sync-BN
    GSPMD or the 1-device step. Here: N full uaps steps on identical
    batch sequences in all three modes, then val mDice on a fixed pool —
    the only multi-chip correctness evidence this environment can
    produce beyond the dryrun."""

    N_STEPS = 120

    def _trajectory(self, mode):
        import dataclasses
        from uaps_tpu.parallel.shardmap_step import make_sharded_train_step
        cfg = tiny_cfg("uaps")
        cfg.data = dataclasses.replace(cfg.data, image_size=(32, 32),
                                       batch_size=8)
        method = get_method("uaps")
        state, model = method.init_state(cfg, jax.random.key(0))
        tx = mbase.make_optimizer(cfg.optim)
        if mode == "shard_map":
            mesh = make_mesh(8)
            step = make_sharded_train_step(method, cfg, model, tx, mesh)
        else:
            mesh = make_mesh(8 if mode == "gspmd" else 1)
            step = jax.jit(method.make_train_step(cfg, model, tx))
        state = replicate_state(state, mesh)
        data = SyntheticDefects(cfg.data, seed=7, labeled_pool=24)
        stream = data.train_iter()
        for _ in range(self.N_STEPS):
            state, metrics = step(state, shard_batch(next(stream), mesh))
        assert np.isfinite(float(metrics["loss"]))
        eval_step = mbase.make_eval_step(cfg, model)
        dices = [float(jax.device_get(eval_step(
            state.params, state.batch_stats, b))["val_mdice"])
            for b in data.val_iter(num_batches=3)]
        return float(np.mean(dices))

    def test_modes_converge_to_equivalent_quality(self, devices):
        d1 = self._trajectory("single")
        dsm = self._trajectory("shard_map")
        dgs = self._trajectory("gspmd")
        print(f"\nval mDice after {self.N_STEPS} steps: "
              f"1-dev {d1:.4f}, shard_map {dsm:.4f}, gspmd {dgs:.4f}")
        # all three must have actually learned (init is ~0.0; 120 steps
        # on easy (default, hard=False) 32px pools reaches ~0.28-0.40 —
        # measured r3: 1-dev 0.3325, shard_map 0.2797, gspmd 0.3984)...
        for d in (d1, dsm, dgs):
            assert d > 0.22, (d1, dsm, dgs)
        # ...and agree within trajectory noise (different BN semantics +
        # decorrelated per-device dropout draws)
        assert abs(dsm - d1) < 0.08, (d1, dsm)
        assert abs(dgs - d1) < 0.08, (d1, dgs)
