"""Benchmark: UAPS SSL training-step throughput (images/sec/chip).

Prints ONE JSON line:
  {"metric": "uaps_train_imgs_per_sec_per_chip", "value": N,
   "unit": "imgs/sec/chip", "vs_baseline": R}

`value` counts total images through the network per second (labeled +
unlabeled streams, the reference's bs-16 + bs-16 step at 256x256 NEU shape,
/root/reference/UAPS_train.py:159-287). `vs_baseline` is the ratio to a
PyTorch-CPU implementation of the same step (the reference publishes no
throughput numbers — SURVEY.md §6 — so the driver target is >=5x torch-CPU
per BASELINE.json). The torch baseline is measured once on this host and
cached in .bench_baseline.json.

All diagnostics go to stderr; stdout carries only the JSON line.
"""
import json
import os
import sys
import time

BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")
BATCH = 16
IMAGE = (256, 256)
NUM_CLASSES = 4
TIMED_STEPS = 20
WARMUP_STEPS = 3

# Fair-baseline floor (imgs/s). This bench host exposes a SINGLE CPU
# (os.sched_getaffinity -> {0}), so any torch-CPU number measured here is
# single-threaded and would inflate vs_baseline ~3.5x (VERDICT r2 "what's
# weak" #1: the honest multithreaded torch-CPU step measured in round 1 on
# an 8-thread host was 0.55 imgs/s; the 1-thread measurement was 0.19).
# vs_baseline therefore divides by max(measured, FLOOR): a weak host can
# never make the ratio look better than the fair multicore baseline.
FAIR_TORCH_FLOOR = 0.55


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# JAX side (TPU)
# ---------------------------------------------------------------------------

def measure_jax() -> float:
    import dataclasses
    import jax
    import numpy as np
    from uaps_tpu.data.synthetic import synthetic_batch
    from uaps_tpu.methods import get_method, base as mbase
    from uaps_tpu.parallel import make_mesh, replicate_state, shard_batch
    from uaps_tpu.utils.config import preset

    # bf16 is the TPU-native training dtype (MXU); fp32 needs remat to fit
    # the double-forward 4-decoder step in 16G HBM.
    dtype = os.environ.get("UAPS_BENCH_DTYPE", "bfloat16")
    cfg = preset("neu", method="uaps")
    cfg.data = dataclasses.replace(cfg.data, batch_size=BATCH,
                                   image_size=IMAGE)
    remat_default = "1" if dtype == "float32" else "0"
    remat = os.environ.get("UAPS_BENCH_REMAT", remat_default) == "1"
    cfg.model = dataclasses.replace(cfg.model, compute_dtype=dtype,
                                    remat=remat)

    n_dev = len(jax.devices())
    log(f"jax devices: {n_dev} x {jax.devices()[0].device_kind}, "
        f"dtype={dtype}")
    method = get_method("uaps")
    state, model = method.init_state(cfg, jax.random.key(0))
    tx = mbase.make_optimizer(cfg.optim)
    step_fn = method.make_train_step(cfg, model, tx)
    step = jax.jit(step_fn, donate_argnums=0)
    # K-step lax.scan per dispatch, mirroring the Trainer's production
    # default (train.py auto-selects k=4 on a single-TPU run): the relay
    # backend charges ~5 ms per jit dispatch (docs/PERF.md), which a
    # single-step loop folds into every step. Override: UAPS_BENCH_K.
    k = int(os.environ.get("UAPS_BENCH_K", "0"))
    if k <= 0:
        k = (4 if (jax.devices()[0].platform == "tpu" and n_dev == 1)
             else 1)

    mesh = make_mesh()
    state = replicate_state(state, mesh)
    rng = np.random.default_rng(0)
    # static batch (input pipeline excluded from the step timing, matching
    # how the reference's GPU step would be timed)
    b = synthetic_batch(rng, BATCH * max(n_dev, 1) // max(n_dev, 1),
                        IMAGE, NUM_CLASSES, 3)
    batch = shard_batch(
        {"image": b["image"], "label": b["label"],
         "uimage": b["image"], "ulabel": b["label"]}, mesh)

    if k > 1:
        import jax.numpy as jnp

        def multi(st, batches):
            return jax.lax.scan(step_fn, st, batches)
        step_scan = jax.jit(multi, donate_argnums=0)
        batch_k = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (k, *x.shape)), batch)
        # the scan path must never sink the driver's unattended bench
        # run: on ANY failure fall back to single-step dispatch (state
        # is re-initialized — a failed donated call may have consumed
        # the old buffers)
        try:
            state, metrics = step_scan(state, batch_k)
            float(metrics["loss"][-1])
            step, batch = step_scan, batch_k
            log(f"dispatch: {k}-step lax.scan per jit call")
        except Exception as e:
            log(f"scan dispatch failed ({type(e).__name__}: "
                f"{str(e)[:200]}); falling back to single-step")
            k = 1
            state, _ = method.init_state(cfg, jax.random.key(0))
            state = replicate_state(state, mesh)

    # NOTE: jax.block_until_ready does not reliably block on the tunneled
    # 'axon' backend; fetching the final chained metric value is the only
    # trustworthy fence, so we sync on metrics['loss'] of the LAST step.
    n_dispatch = max(1, TIMED_STEPS // k)
    timed_steps = n_dispatch * k
    for _ in range(WARMUP_STEPS):
        state, metrics = step(state, batch)
    float(metrics["loss"][-1] if k > 1 else metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n_dispatch):
        state, metrics = step(state, batch)
    final_loss = float(metrics["loss"][-1] if k > 1 else metrics["loss"])
    dt = time.perf_counter() - t0
    log(f"final loss after timed steps: {final_loss:.4f}")
    imgs = timed_steps * 2 * BATCH  # labeled + unlabeled per step
    per_chip = imgs / dt / max(n_dev, 1)
    log(f"jax: {timed_steps} steps in {dt:.3f}s -> "
        f"{imgs / dt:.2f} imgs/s total, {per_chip:.2f} imgs/s/chip")
    return per_chip


# ---------------------------------------------------------------------------
# Torch-CPU baseline: an independent minimal implementation of the same
# UAPS step (NOT copied from the reference; built from the architecture
# spec in SURVEY.md §3.2).
# ---------------------------------------------------------------------------

def measure_torch_cpu() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        # never reuse a measurement taken with fewer threads than the
        # host has cores (VERDICT r2: a stale 1-thread cache inflated
        # vs_baseline 3.5x and kept re-corrupting every future run)
        if (cached.get("batch") == BATCH
                and cached.get("image") == list(IMAGE)
                and cached.get("threads", 0) >= (os.cpu_count() or 1)):
            log(f"torch baseline (cached): {cached['imgs_per_sec']:.2f}")
            return cached["imgs_per_sec"]

    # torch reads OMP_NUM_THREADS at import: force full threads BEFORE
    # importing, or an inherited OMP_NUM_THREADS=1 silently measures a
    # single-threaded baseline (caught once: 0.20 vs the fair 0.55)
    os.environ.setdefault("OMP_NUM_THREADS", str(os.cpu_count() or 8))
    import numpy as np
    import torch
    import torch.nn as nn
    import torch.nn.functional as F
    torch.set_num_threads(os.cpu_count() or 8)

    FT = [16, 32, 64, 128, 256]
    DP = [0.05, 0.1, 0.2, 0.3, 0.5]

    def conv_block(cin, cout, p):
        return nn.Sequential(
            nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.LeakyReLU(), nn.Dropout(p),
            nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout),
            nn.LeakyReLU())

    class Enc(nn.Module):
        def __init__(self):
            super().__init__()
            self.blocks = nn.ModuleList(
                [conv_block(3, FT[0], DP[0])]
                + [conv_block(FT[i], FT[i + 1], DP[i + 1]) for i in range(4)])

        def forward(self, x):
            feats = []
            for i, b in enumerate(self.blocks):
                if i:
                    x = F.max_pool2d(x, 2)
                x = b(x)
                feats.append(x)
            return feats

    class Dec(nn.Module):
        def __init__(self, n_cls):
            super().__init__()
            self.proj = nn.ModuleList(
                [nn.Conv2d(FT[i + 1], FT[i], 1) for i in range(4)])
            self.blocks = nn.ModuleList(
                [conv_block(2 * FT[i], FT[i], 0.0) for i in range(4)])
            self.out = nn.Conv2d(FT[0], n_cls, 3, padding=1)

        def forward(self, feats):
            x = feats[4]
            for i in reversed(range(4)):
                x = F.interpolate(self.proj[i](x), scale_factor=2,
                                  mode="bilinear", align_corners=True)
                x = self.blocks[i](torch.cat([feats[i], x], 1))
            return self.out(x)

    class Net(nn.Module):
        def __init__(self, n_cls=NUM_CLASSES):
            super().__init__()
            self.enc = Enc()
            self.decs = nn.ModuleList([Dec(n_cls) for _ in range(4)])

        def forward(self, x):
            feats = self.enc(x)
            outs = [self.decs[0](feats)]
            # perturbed aux branches
            noisy = [f * (1 + torch.empty_like(f).uniform_(-0.3, 0.3))
                     for f in feats]
            outs.append(self.decs[1](noisy))
            outs.append(self.decs[2]([F.dropout(f, 0.5) for f in feats]))
            att = [f.mean(1, keepdim=True) for f in feats]
            thr = [a.amax(dim=(2, 3), keepdim=True) * 0.8 for a in att]
            outs.append(self.decs[3](
                [f * (a < t).float() for f, a, t in zip(feats, att, thr)]))
            return outs

    def dice(logits, labels, n_cls=NUM_CLASSES):
        p = F.softmax(logits, 1)
        oh = F.one_hot(labels, n_cls).permute(0, 3, 1, 2).float()
        inter = (p * oh).sum((0, 2, 3))
        card = (p + oh).sum((0, 2, 3))
        return 1 - (2 * inter / (card + 1e-7)).mean()

    net = Net()
    opt = torch.optim.Adam(net.parameters(), lr=1e-3)
    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        rng.standard_normal((BATCH, 3, *IMAGE)).astype(np.float32))
    y = torch.from_numpy(
        rng.integers(0, NUM_CLASSES, (BATCH, *IMAGE)).astype(np.int64))
    xu = x.clone()

    def step():
        outs = net(x)
        sup = sum(0.5 * (F.cross_entropy(o, y) + dice(o, y))
                  for o in outs) / 4
        un_outs = net(xu)
        soft = [F.softmax(o, 1) for o in un_outs]
        preds = sum(soft) / 4
        variances = [
            (preds * (torch.log(preds + 1e-12) - F.log_softmax(o, 1))
             ).sum(1) for o in un_outs]
        l_unc = (sum(variances) / 4).mean()
        w = np.random.dirichlet(np.ones(4))
        pseudo = sum(wi * s.detach() for wi, s in zip(w, soft)).argmax(1)
        ps = sum((0.5 * (F.cross_entropy(o, pseudo) + dice(o, pseudo)))
                 * torch.exp(-v).mean()
                 for o, v in zip(un_outs, variances)) / 4
        loss = sup + 0.1 * ps + 0.1 * l_unc
        opt.zero_grad()
        loss.backward()
        opt.step()

    n_timed = int(os.environ.get("UAPS_BENCH_TORCH_STEPS", "5"))
    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(n_timed):
        step()
    dt = time.perf_counter() - t0
    imgs_per_sec = n_timed * 2 * BATCH / dt
    log(f"torch-cpu: {n_timed} steps in {dt:.2f}s -> "
        f"{imgs_per_sec:.2f} imgs/s")
    with open(BASELINE_CACHE, "w") as f:
        json.dump({"imgs_per_sec": imgs_per_sec, "batch": BATCH,
                   "image": list(IMAGE), "threads": torch.get_num_threads(),
                   "cpus": len(os.sched_getaffinity(0)), "steps": n_timed},
                  f)
    return imgs_per_sec


def main():
    jax_ips = measure_jax()
    try:
        torch_ips = measure_torch_cpu()
    except Exception as e:  # torch baseline is best-effort
        log(f"torch baseline failed: {e!r}")
        torch_ips = None
    # divide by the FAIR baseline: never let a single-CPU host's slow
    # torch measurement inflate the ratio (see FAIR_TORCH_FLOOR above)
    baseline = max(torch_ips or 0.0, FAIR_TORCH_FLOOR)
    if torch_ips is None:
        baseline_source = "floor"
        log(f"torch baseline unmeasured; assuming fair multicore floor "
            f"{FAIR_TORCH_FLOOR} for vs_baseline")
    elif torch_ips < FAIR_TORCH_FLOOR:
        baseline_source = "floor"
        log(f"measured torch-cpu {torch_ips:.3f} < fair multicore floor "
            f"{FAIR_TORCH_FLOOR}; using the floor for vs_baseline")
    else:
        baseline_source = "measured"
    vs = round(jax_ips / baseline, 3) if baseline else None
    print(json.dumps({
        "metric": "uaps_train_imgs_per_sec_per_chip",
        "value": round(jax_ips, 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": vs,
        "baseline_source": baseline_source,
    }))


if __name__ == "__main__":
    main()
