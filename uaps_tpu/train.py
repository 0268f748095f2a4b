"""Training CLI + Trainer loop.

Replaces every reference `python X_train.py` entry point (SURVEY.md §2.2)
with one CLI:

    python -m uaps_tpu.train --preset neu --method uaps
    python -m uaps_tpu.train --preset synthetic --method baseline --epochs 2

Structure mirrors the reference's epoch loop (UAPS_train.py:109-465):
train `iter_per_epoch` steps -> epoch metric means -> val sweep on the main
decoder -> plateau scheduler on val mDice -> keep-best checkpoint — but the
step is one jitted SPMD program over the device mesh, metrics stay on
device until the epoch boundary, and data comes from explicitly infinite
samplers (fixing the un-cycled zip crash path, SURVEY §5.3).
"""
from __future__ import annotations

import argparse
import dataclasses
import logging
import os
import time
from typing import Dict, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uaps_tpu.methods import get_method, base as method_base
from uaps_tpu.parallel import make_mesh, replicate_state, shard_batch, \
    shard_batch_stacked, distributed_init, local_batch_shard
from uaps_tpu.utils.checkpoint import CheckpointManager
from uaps_tpu.utils.config import Config, preset
from uaps_tpu.utils.logging_utils import get_logger, MetricWriter


def make_data(cfg: Config, seed: int = 0):
    """Dataset factory: synthetic fixture or the real image pipeline."""
    if cfg.data.name == "synthetic":
        from uaps_tpu.data.synthetic import SyntheticDefects
        return SyntheticDefects(cfg.data, seed=seed)
    import dataclasses
    from uaps_tpu.data.pipeline import DefectDataset
    data_cfg = cfg.data
    if cfg.method.name == "ucc" and data_cfg.name == "neu":
        # UCC has its own NEU pipeline with weak/strong streams
        # (UCC/UCC_dataloaders.py); same files, different aug recipe
        data_cfg = dataclasses.replace(data_cfg, name="ucc_neu")
    return DefectDataset(data_cfg, seed=seed)


def _prefetch(it: Iterator, size: int = 4) -> Iterator:
    """Run an iterator in a daemon thread with a bounded queue so host
    batch construction overlaps device steps (the synthetic generator and
    any non-threaded source would otherwise serialize with the TPU)."""
    import queue
    import threading
    q: "queue.Queue" = queue.Queue(maxsize=size)

    def worker():
        for item in it:
            q.put(item)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        yield q.get()


def _train_stream(data, method_name: str) -> Iterator[Dict]:
    if method_name == "ucc":
        return _prefetch(data.train_iter_weak_strong())
    return _prefetch(data.train_iter())


class Trainer:
    def __init__(self, cfg: Config, num_devices: Optional[int] = None,
                 data=None):
        self.cfg = cfg
        if cfg.run.prng_impl != "threefry2x32":
            jax.config.update("jax_default_prng_impl", cfg.run.prng_impl)
        # the data axis must divide the batch; cap the mesh at the largest
        # divisor of batch_size within the available device count
        avail = num_devices or len(jax.devices())
        n = max(d for d in range(1, avail + 1)
                if cfg.data.batch_size % d == 0)
        self.mesh = make_mesh(n)
        # use_shard_map=None -> auto: shard_map is the DEFAULT multi-chip
        # path (keeps Pallas kernels partitioned; per-device BN like the
        # reference's DataParallel). GSPMD (sync-BN) is the opt-out.
        use_sm = cfg.run.use_shard_map
        self.use_shard_map = (self.mesh.devices.size > 1 if use_sm is None
                              else bool(use_sm))
        if self.mesh.devices.size > 1 and not self.use_shard_map:
            # GSPMD mode: pallas_call runs replicated under GSPMD — route
            # convs/loss kernels to XLA via config (threaded through
            # module attributes, not a module global)
            cfg = dataclasses.replace(
                cfg, model=dataclasses.replace(cfg.model,
                                               conv_backend="xla"))
            self.cfg = cfg
        self.logger = get_logger(cfg.run.out_dir)
        self.writer = MetricWriter(cfg.run.out_dir)
        self.method = get_method(cfg.method.name)
        self.data = data if data is not None else make_data(
            cfg, seed=cfg.run.seed)

        rng = jax.random.key(cfg.run.seed)
        self.state, self.model = self.method.init_state(cfg, rng)
        self.tx = method_base.make_optimizer(cfg.optim)
        if self.use_shard_map and self.mesh.devices.size > 1:
            from uaps_tpu.parallel.shardmap_step import \
                make_sharded_train_step
            self.train_step = make_sharded_train_step(
                self.method, cfg, self.model, self.tx, self.mesh)
        else:
            step_fn = self.method.make_train_step(cfg, self.model, self.tx)
            self.train_step = jax.jit(step_fn, donate_argnums=0)
        # K-step scan per dispatch (RunConfig.steps_per_dispatch):
        # identical updates, one host round-trip per K steps. 0 = auto
        # (4 on a single-TPU run, 1 elsewhere).
        k = cfg.run.steps_per_dispatch
        if k == 0:
            k = (4 if (jax.devices()[0].platform == "tpu"
                       and self.mesh.devices.size == 1) else 1)
        self.k_dispatch = max(1, k)
        if cfg.run.profile_steps or (
                self.use_shard_map and self.mesh.devices.size > 1):
            self.k_dispatch = 1
        if self.k_dispatch > 1:
            def multi(state, batches):
                return jax.lax.scan(step_fn, state, batches)
            self.train_step_scan = jax.jit(multi, donate_argnums=0)
        # eval runs as a plain GSPMD jit over the sharded batch even in
        # shard_map training mode — route its convs to XLA on >1 device
        # (pallas_call runs replicated under GSPMD; same invariant as the
        # GSPMD train path above)
        eval_model = self.model
        if (self.mesh.devices.size > 1
                and getattr(self.model, "conv_backend", "xla") != "xla"):
            eval_model = self.model.clone(conv_backend="xla")
        self.eval_step = method_base.make_eval_step(cfg, eval_model)
        # device-resident pools: when the dataset carries FIXED labeled +
        # unlabeled pools, fold sampling and the whole epoch into one
        # jitted lax.scan — zero per-step host traffic (the loopback
        # relay's upload bandwidth otherwise caps 256² training at ~10
        # imgs/s vs the chip's 358; see data/device_pool.py)
        self.device_pools = False
        self._val_sweep = None
        if cfg.run.device_pools and not (
                self.mesh.devices.size == 1
                and getattr(self.data, "_pool", None) is not None
                and getattr(self.data, "_upool", None) is not None):
            why = ("mesh has >1 device" if self.mesh.devices.size != 1
                   else "dataset has no fixed _pool/_upool arrays")
            logging.getLogger("uaps").warning(
                "device_pools requested but disabled: %s; falling back to "
                "the (much slower through a relay) host-fed pipeline", why)
        if (cfg.run.device_pools and self.mesh.devices.size == 1
                and getattr(self.data, "_pool", None) is not None
                and getattr(self.data, "_upool", None) is not None):
            from uaps_tpu.data import device_pool as dpool
            self._pools = dpool.put_pools(self.data)
            self._epoch_fn = dpool.make_pool_epoch(
                step_fn, cfg.data.batch_size, cfg.run.iter_per_epoch,
                weak_strong=(cfg.method.name == "ucc"))
            self.device_pools = True
            if getattr(self.data, "_val", None) is not None:
                n_val = self.data._val["image"].shape[0]
                if n_val % cfg.data.batch_size == 0:
                    self._val_pool = (
                        jax.device_put(self.data._val["image"]),
                        jax.device_put(self.data._val["label"]))
                    self._val_sweep = dpool.make_pool_eval(
                        self.eval_step, cfg.data.batch_size)
                else:
                    # the host validate() path sweeps the remainder batch
                    # (drop_last=False); the jitted sweep would silently
                    # drop it — fall back rather than diverge
                    logging.getLogger("uaps").warning(
                        "val pool size %d not a multiple of batch_size %d;"
                        " using the host validate() path", n_val,
                        cfg.data.batch_size)
        self.scheduler = method_base.PlateauScheduler(cfg.optim)
        # CPS runs two optimizers with their own plateau schedulers
        # (reference CPS_train.py:115-119)
        self.scheduler2 = (method_base.PlateauScheduler(cfg.optim)
                           if self.state.second is not None else None)
        self.ckpt = CheckpointManager(
            os.path.join(cfg.run.out_dir, "checkpoints"),
            keep=cfg.run.keep_checkpoints)
        self.best_dice = -1.0
        self.epochs_since_best = 0

        # replicate state over the mesh; batches arrive sharded on 'data'
        self.state = replicate_state(self.state, self.mesh)

    # ------------------------------------------------------------------
    def maybe_resume(self) -> int:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.state)
        restored, host = self.ckpt.restore(abstract)
        if restored is None:
            return 0
        self.state = replicate_state(restored, self.mesh)
        host = host or {}
        self.best_dice = host.get("best_dice", -1.0)
        self.epochs_since_best = host.get("epochs_since_best", 0)
        self.scheduler.best = host.get("sched_best", -float("inf"))
        self.scheduler.bad_epochs = host.get("sched_bad", 0)
        if self.scheduler2 is not None:
            self.scheduler2.best = host.get("sched2_best", -float("inf"))
            self.scheduler2.bad_epochs = host.get("sched2_bad", 0)
        start_epoch = host.get("epoch", 0)
        self.logger.info(
            f"resumed from step {int(jax.device_get(self.state.step))} "
            f"(epoch {start_epoch}, best dice {self.best_dice:.4f})")
        return start_epoch

    # ------------------------------------------------------------------
    def _sched_host(self) -> Dict[str, float]:
        host = {"sched_best": self.scheduler.best,
                "sched_bad": self.scheduler.bad_epochs}
        if self.scheduler2 is not None:
            host["sched2_best"] = self.scheduler2.best
            host["sched2_bad"] = self.scheduler2.bad_epochs
        return host

    # ------------------------------------------------------------------
    def validate(self) -> Dict[str, float]:
        """Validation sweep. MT/UAMT validate the STUDENT weights
        (MT_train.py:352 uses self.model); the EMA teacher is evaluable
        via eval.py --eval_ema. CPS evaluates BOTH nets like the reference
        (CPS_train.py:352-377) — the second net's metrics arrive with a
        'val2_' prefix."""
        weight_sets = [("", self.state.params, self.state.batch_stats)]
        if self.state.second is not None:
            weight_sets.append(("2", self.state.second.params,
                                self.state.second.batch_stats))
        if self._val_sweep is not None:
            # one dispatch sweeps the whole device-resident val pool
            out: Dict[str, float] = {}
            for tag, params, bstats in weight_sets:
                m = jax.device_get(
                    self._val_sweep(params, bstats, *self._val_pool))
                for k, v in m.items():
                    k = k.replace("val_", f"val{tag}_") if tag else k
                    out[k] = float(v)
            return out
        sums: Dict[str, float] = {}
        n = 0
        for batch in self.data.val_iter():
            # remainder val batches (real data, drop_last=False semantics
            # like the reference) may not divide the mesh; run them
            # replicated (one extra compile for that shape)
            if batch["image"].shape[0] % self.mesh.devices.size == 0:
                batch = shard_batch(local_batch_shard(batch), self.mesh)
            for tag, params, bstats in weight_sets:
                m = jax.device_get(self.eval_step(params, bstats, batch))
                for k, v in m.items():
                    k = k.replace("val_", f"val{tag}_") if tag else k
                    sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}

    # ------------------------------------------------------------------
    def run(self, resume: bool = False):
        cfg = self.cfg
        start_epoch = self.maybe_resume() if resume else 0
        stream = (None if self.device_pools
                  else _train_stream(self.data, cfg.method.name))
        self.logger.info(
            f"method={cfg.method.name} model={cfg.model.name} "
            f"devices={self.mesh.devices.size} "
            f"batch={cfg.data.batch_size} image={cfg.data.image_size}")
        if cfg.run.debug_nans:
            jax.config.update("jax_debug_nans", True)

        for epoch in range(start_epoch + 1, cfg.run.epochs + 1):
            t0 = time.time()
            epoch_metrics = []
            it = 0
            if self.device_pools:
                # whole epoch in ONE dispatch; sampling keys are a
                # deterministic function of (seed, epoch) so resume
                # reproduces the same batch sequence
                ekey = jax.random.fold_in(
                    jax.random.key(cfg.run.seed + 424242), epoch)
                self.state, metrics = self._epoch_fn(self.state, ekey,
                                                     *self._pools)
                epoch_metrics.append(metrics)
                it = cfg.run.iter_per_epoch
            while it < cfg.run.iter_per_epoch:
                k = min(self.k_dispatch, cfg.run.iter_per_epoch - it)
                if k > 1 and k == self.k_dispatch:
                    # per-host feed: each process stacks only its local
                    # rows of every batch (parallel/mesh.local_batch_shard)
                    raw = [local_batch_shard(next(stream))
                           for _ in range(k)]
                    stacked = jax.tree.map(
                        lambda *xs: np.stack(xs), *raw)
                    batches = shard_batch_stacked(stacked, self.mesh)
                    self.state, metrics = self.train_step_scan(
                        self.state, batches)     # metrics: [K]-arrays
                    epoch_metrics.append(metrics)
                    it += k
                    continue
                batch = shard_batch(local_batch_shard(next(stream)),
                                    self.mesh)
                if (cfg.run.profile_steps
                        and epoch == 1 and it == cfg.run.profile_steps[0]):
                    jax.profiler.start_trace(
                        os.path.join(cfg.run.out_dir, "profile"))
                self.state, metrics = self.train_step(self.state, batch)
                epoch_metrics.append(metrics)
                if (cfg.run.profile_steps
                        and epoch == 1 and it == cfg.run.profile_steps[1]):
                    jax.block_until_ready(self.state.params)
                    jax.profiler.stop_trace()
                it += 1
            # single device->host sync per epoch
            epoch_metrics = jax.device_get(epoch_metrics)
            means = {
                k: float(np.nanmean(np.concatenate(
                    [np.atleast_1d(np.asarray(m[k], np.float64))
                     for m in epoch_metrics])))
                for k in epoch_metrics[0]
            }
            steps = cfg.run.iter_per_epoch
            dt = time.time() - t0
            imgs = steps * cfg.data.batch_size
            means["imgs_per_sec"] = imgs / dt
            means["lr"] = method_base.get_lr(self.state)

            if cfg.run.halt_on_nan and not np.isfinite(
                    means.get("loss", 0.0)):
                # failure detection (SURVEY §5.3): a NaN epoch means the
                # run is lost from here — stop with state intact rather
                # than silently training garbage.
                self.ckpt.wait()
                raise FloatingPointError(
                    f"non-finite loss {means['loss']} at epoch {epoch}; "
                    f"last good checkpoint: step {self.ckpt.latest_step()}")

            val = self.validate()
            self.state = self.scheduler.step(self.state, val["val_mdice"])
            if self.scheduler2 is not None:
                self.state = self.state.replace(
                    second=self.scheduler2.step(self.state.second,
                                                val["val2_mdice"]))

            self.writer.write(epoch, {**means, **val})
            self.logger.info(
                f"epoch {epoch:03d}/{cfg.run.epochs} "
                f"loss {means.get('loss', float('nan')):.4f} "
                f"train_dice {means.get('train_mdice', float('nan')):.4f} "
                f"val_dice {val['val_mdice']:.4f} "
                f"val_miou {val['val_miou']:.4f} "
                f"({means['imgs_per_sec']:.1f} img/s)")

            # keep-best on the best net's dice (the reference checkpoints
            # each CPS net on its own best — the combined state here
            # covers both, gated on whichever improved)
            gate_dice = max(val["val_mdice"],
                            val.get("val2_mdice", float("-inf")))
            improved = gate_dice > self.best_dice
            if improved:
                self.best_dice = gate_dice
                self.epochs_since_best = 0
            else:
                self.epochs_since_best += 1
            if improved:
                self.ckpt.save(
                    int(jax.device_get(self.state.step)),
                    jax.device_get(self.state),
                    host_state={
                        "epoch": epoch, "best_dice": self.best_dice,
                        "epochs_since_best": self.epochs_since_best,
                        "config_method": cfg.method.name,
                        **self._sched_host(),
                    },
                    metrics=val)
            elif cfg.run.save_every and epoch % cfg.run.save_every == 0:
                # periodic latest-state checkpoint for preemption safety
                self.ckpt.save(
                    int(jax.device_get(self.state.step)),
                    jax.device_get(self.state),
                    host_state={"epoch": epoch, "best_dice": self.best_dice,
                                "epochs_since_best": self.epochs_since_best,
                                **self._sched_host()},
                    metrics=val)
            if (cfg.run.early_stop_patience
                    and self.epochs_since_best >= cfg.run.early_stop_patience):
                self.logger.info(
                    f"early stop: no val mDice improvement in "
                    f"{self.epochs_since_best} epochs "
                    f"(best {self.best_dice:.4f})")
                break
        self.ckpt.wait()
        self.writer.close()
        return self.best_dice


def parse_args(argv=None) -> Config:
    p = argparse.ArgumentParser(description="uaps-tpu trainer")
    p.add_argument("--preset", default="synthetic",
                   help="neu|dagm|mtiles|kosdd2|synthetic")
    p.add_argument("--method", default=None,
                   help="uaps|baseline|mt|uamt|cps|cct|dct|ucc")
    p.add_argument("--model", default=None)
    p.add_argument("--num_classes", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--iter_per_epoch", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--base_lr", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--labeled_fraction", type=float, default=None)
    p.add_argument("--consistency1", type=float, default=None)
    p.add_argument("--consistency2", type=float, default=None)
    p.add_argument("--consistency_rampup", type=float, default=None)
    p.add_argument("--ema_decay", type=float, default=None)
    p.add_argument("--n_aux", type=int, default=None)
    p.add_argument("--dtype", default=None, choices=["float32", "bfloat16"])
    p.add_argument("--out_dir", default=None)
    p.add_argument("--image_root", default=None)
    p.add_argument("--mask_root", default=None)
    p.add_argument("--test_image_root", default=None)
    p.add_argument("--test_mask_root", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--num_devices", type=int, default=None)
    p.add_argument("--debug_nans", action="store_true")
    p.add_argument("--prng_impl", default=None,
                   choices=["threefry2x32", "rbg", "unsafe_rbg"])
    p.add_argument("--shard_map", action="store_true",
                   help="force shard_map mode (default: auto — shard_map "
                        "whenever the mesh has >1 device)")
    p.add_argument("--gspmd", action="store_true",
                   help="force GSPMD mode (jit-sharded, sync-BN, XLA "
                        "convs) instead of the default shard_map path")
    p.add_argument("--fused_batch", action="store_true",
                   help="one forward over [labeled; unlabeled] "
                        "(joint-batch BN, documented deviation)")
    p.add_argument("--stack_decoders", action="store_true",
                   help="vmap the 1+n_aux decoders over stacked params")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder/decoder segments (fits "
                        "fp32 bs16 256x256 in 16G HBM)")
    p.add_argument("--steps_per_dispatch", type=int, default=None,
                   help="K>1 runs K steps per dispatch via lax.scan "
                        "(identical updates, amortized dispatch)")
    p.add_argument("--device_pools", action="store_true",
                   help="device-resident fixed pools: sample batches and "
                        "run whole epochs inside one jitted scan (needs "
                        "a dataset with fixed pools; see "
                        "data/device_pool.py)")
    p.add_argument("--head_variant", default=None,
                   choices=["taps", "im2col", "dhdw", "dwnp", "dwm",
                            "dwmf", "xla"],
                   help="out_conv logits-head kernel (PERF.md A/B knob)")
    p.add_argument("--early_stop_patience", type=int, default=None,
                   help="stop after N epochs without a new best val "
                        "mDice (0/default: run all epochs like the "
                        "reference)")
    p.add_argument("--dropout_backend", default=None,
                   choices=["auto", "xla", "pallas"],
                   help="ConvBlock dropout: flax nn.Dropout or the "
                        "pallas fused_dropout kernel")
    args, _ = p.parse_known_args(argv)

    if args.preset == "synthetic":
        cfg = preset("synthetic", method=args.method or "uaps")
    elif args.preset == "neu":
        cfg = preset("neu", method=args.method or "uaps")
    else:
        cfg = preset(args.preset)

    def rep(node, **kw):
        kw = {k: v for k, v in kw.items() if v is not None}
        return dataclasses.replace(node, **kw)

    cfg = Config(
        data=rep(cfg.data, num_classes=args.num_classes,
                 batch_size=args.batch_size,
                 labeled_fraction=args.labeled_fraction,
                 image_root=args.image_root, mask_root=args.mask_root,
                 test_image_root=args.test_image_root,
                 test_mask_root=args.test_mask_root),
        model=rep(cfg.model, name=args.model, n_aux=args.n_aux,
                  compute_dtype=args.dtype,
                  stack_decoders=args.stack_decoders or None,
                  head_variant=args.head_variant,
                  dropout_backend=args.dropout_backend,
                  remat=args.remat or None),
        method=rep(cfg.method, name=args.method,
                   consistency1=args.consistency1,
                   consistency2=args.consistency2,
                   consistency_rampup=args.consistency_rampup,
                   ema_decay=args.ema_decay,
                   fused_batch=args.fused_batch or None),
        optim=rep(cfg.optim, base_lr=args.base_lr),
        run=rep(cfg.run, epochs=args.epochs,
                iter_per_epoch=args.iter_per_epoch, seed=args.seed,
                out_dir=args.out_dir, prng_impl=args.prng_impl,
                use_shard_map=(True if args.shard_map
                               else (False if args.gspmd else None)),
                steps_per_dispatch=args.steps_per_dispatch,
                device_pools=args.device_pools or None,
                early_stop_patience=args.early_stop_patience,
                debug_nans=args.debug_nans or None),
    )
    return cfg, args


def main(argv=None):
    distributed_init()
    cfg, args = parse_args(argv)
    trainer = Trainer(cfg, num_devices=args.num_devices)
    best = trainer.run(resume=args.resume)
    trainer.logger.info(f"done; best val mDice {best:.4f}")
    return best


if __name__ == "__main__":
    main()
