"""Batched inference engine + directory-processing CLI.

The reference's only serving story is per-image notebook loops
(UAPS-Testing.ipynb cells 11-19, bs=1 sweeps). This module provides a
compiled fixed-shape predictor with automatic micro-batching/padding,
optional TTA (BaseNet multi-scale flip harness, or flip-averaging for
U-Net models), uncertainty maps, and a CLI that sweeps a directory of
images into masks. For concurrent request traffic, `uaps_tpu.server`
wraps this engine in an async dynamic-batching dispatcher + HTTP
endpoint.

    python -m uaps_tpu.serve --preset neu --method uaps \
        --out_dir runs/neu --images /data/imgs --out /tmp/masks

API:
    engine = InferenceEngine(cfg, ckpt_dir)     # or .from_torch(pth)
    masks, probs = engine.predict(images_u8)    # numpy in, numpy out
    umaps = engine.uncertainty(images_u8)
"""
from __future__ import annotations

import argparse
import os
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from uaps_tpu.methods import get_method, base as method_base
from uaps_tpu.ops import kl_divergence_map
from uaps_tpu.utils.checkpoint import CheckpointManager


class InferenceEngine:
    """Fixed-shape jitted predictor with padding micro-batcher."""

    def __init__(self, cfg, ckpt_dir: Optional[str] = None,
                 batch_size: Optional[int] = None,
                 params=None, batch_stats=None, tta: bool = False):
        """tta=True averages predictions over test-time augmentations:
        BaseNet models run their multi-scale flip harness (reference
        utilities/base.py:23-46), U-Net family models average softmax
        over the 4 H/V flips — all inside the one jitted predictor."""
        self.cfg = cfg
        self.batch_size = batch_size or cfg.data.batch_size
        method = get_method(cfg.method.name)
        state, self.model = method.init_state(cfg, jax.random.key(0))
        if params is not None:
            self.params, self.batch_stats = params, batch_stats
        else:
            ckpt = CheckpointManager(os.path.abspath(ckpt_dir))
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
            step = ckpt.best_step() or ckpt.latest_step()
            restored, _ = ckpt.restore(abstract, step=step)
            if restored is None:
                raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
            self.params = restored.params
            self.batch_stats = restored.batch_stats

        has_main_only = hasattr(self.model, "main_only")
        is_basenet = cfg.model.name.startswith("basenet")
        model = self.model

        def _forward(variables, x):
            if has_main_only:
                return model.apply(variables, x, train=False,
                                   method=model.main_only)
            out = model.apply(variables, x, train=False)
            return out["dp0"] if isinstance(out, dict) else out

        @jax.jit
        def _predict(params, batch_stats, x):
            variables = {"params": params, "batch_stats": batch_stats}
            if tta and is_basenet:
                scores = model.apply(variables, x, train=False, tta=True)
                probs = scores / jnp.sum(scores, axis=-1, keepdims=True)
            elif tta:
                from uaps_tpu.ops.tta import flip_tta_softmax
                probs = flip_tta_softmax(_forward, variables, x)
            else:
                probs = jax.nn.softmax(_forward(variables, x), axis=-1)
            return jnp.argmax(probs, axis=-1).astype(jnp.int32), probs

        @jax.jit
        def _uncertainty(params, batch_stats, x):
            variables = {"params": params, "batch_stats": batch_stats}
            out = self.model.apply(variables, x, train=False,
                                   rngs={"perturb": jax.random.key(0)})
            outs = out if isinstance(out, tuple) else (out,)
            if len(outs) < 2:
                return jnp.zeros(x.shape[:3])
            preds = sum(jax.nn.softmax(o, -1) for o in outs) / len(outs)
            return kl_divergence_map(outs[0], preds)

        self._predict = _predict
        self._uncertainty = _uncertainty

    @classmethod
    def from_torch(cls, cfg, pth_path: str, **kw):
        """Serve a reference .pth checkpoint directly."""
        from uaps_tpu.utils.torch_import import load_pth
        method = get_method(cfg.method.name)
        state, model = method.init_state(cfg, jax.random.key(0))
        params, stats = load_pth(pth_path, state.params, state.batch_stats)
        return cls(cfg, params=params, batch_stats=stats, **kw)

    # ------------------------------------------------------------------
    def export(self, path: str) -> None:
        """Serialize the compiled predictor to ONE self-contained
        deployment artifact (jax.export StableHLO blob, weights baked in
        as constants, plus the preprocessing header). Deserialization
        needs jax but none of this package's model/config code:
        `ExportedEngine(path).predict(images)`."""
        import json
        from jax import export as jexport
        h, w = self.cfg.data.image_size
        spec = jax.ShapeDtypeStruct(
            (self.batch_size, h, w, self.cfg.data.in_channels),
            jnp.float32)
        params, stats = self.params, self.batch_stats
        exported = jexport.export(
            jax.jit(lambda x: self._predict(params, stats, x)))(spec)
        blob = exported.serialize()
        header = json.dumps({
            "batch_size": self.batch_size, "image_size": [h, w],
            "in_channels": self.cfg.data.in_channels,
            "mean": list(self.cfg.data.mean),
            "std": list(self.cfg.data.std),
            "num_classes": self.cfg.data.num_classes,
            "model": self.cfg.model.name,
        }).encode()
        with open(path, "wb") as f:
            f.write(len(header).to_bytes(8, "little"))
            f.write(header)
            f.write(blob)


    # ------------------------------------------------------------------
    def _normalize(self, images: np.ndarray) -> np.ndarray:
        if images.dtype == np.uint8:
            from uaps_tpu import native
            return native.normalize_batch(images, self.cfg.data.mean,
                                          self.cfg.data.std)
        return images.astype(np.float32)

    def _microbatches(self, x: np.ndarray):
        bs = self.batch_size
        for i in range(0, x.shape[0], bs):
            chunk = x[i:i + bs]
            pad = bs - chunk.shape[0]
            if pad:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], pad, axis=0)])
            yield chunk, bs - pad

    def predict(self, images: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """images [N,H,W,C] uint8 or normalized float32 ->
        (masks [N,H,W] int32, probs [N,H,W,C] float32)."""
        x = self._normalize(images)
        masks, probs = [], []
        for chunk, n in self._microbatches(x):
            m, p = self._predict(self.params, self.batch_stats,
                                 jnp.asarray(chunk))
            masks.append(np.asarray(m)[:n])
            probs.append(np.asarray(p)[:n])
        return np.concatenate(masks), np.concatenate(probs)

    def uncertainty(self, images: np.ndarray) -> np.ndarray:
        x = self._normalize(images)
        maps = []
        for chunk, n in self._microbatches(x):
            u = self._uncertainty(self.params, self.batch_stats,
                                  jnp.asarray(chunk))
            maps.append(np.asarray(u)[:n])
        return np.concatenate(maps)


class ExportedEngine:
    """Load + run an InferenceEngine.export() artifact: the same
    predict() contract (uint8/float batches in, masks + probs out)
    without needing checkpoints, configs, or the model zoo."""

    def __init__(self, path: str):
        import json
        from jax import export as jexport
        with open(path, "rb") as f:
            n = int.from_bytes(f.read(8), "little")
            self.meta = json.loads(f.read(n).decode())
            self._exported = jexport.deserialize(f.read())
        self.batch_size = self.meta["batch_size"]

    def _normalize(self, images: np.ndarray) -> np.ndarray:
        if images.dtype == np.uint8:
            mean = np.asarray(self.meta["mean"], np.float32) * 255.0
            std = np.asarray(self.meta["std"], np.float32) * 255.0
            return (images.astype(np.float32) - mean) / std
        return images.astype(np.float32)

    def predict(self, images: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        x = self._normalize(images)
        bs = self.batch_size
        masks, probs = [], []
        for i in range(0, x.shape[0], bs):
            chunk = x[i:i + bs]
            n = chunk.shape[0]
            if n < bs:
                chunk = np.concatenate(
                    [chunk, np.repeat(chunk[-1:], bs - n, axis=0)])
            m, p = self._exported.call(jnp.asarray(chunk))
            masks.append(np.asarray(m)[:n])
            probs.append(np.asarray(p)[:n])
        return np.concatenate(masks), np.concatenate(probs)


def main(argv=None):
    from uaps_tpu.train import parse_args
    from uaps_tpu.eval import colorize
    import cv2
    cfg, _ = parse_args(argv)
    p = argparse.ArgumentParser()
    p.add_argument("--images", default=None)
    p.add_argument("--out", default=None)
    p.add_argument("--export", default=None, metavar="PATH",
                   help="write a self-contained jax.export deployment "
                        "artifact (weights baked in) and exit")
    p.add_argument("--ckpt", default=None)
    p.add_argument("--torch_ckpt", default=None)
    p.add_argument("--uncertainty", action="store_true")
    p.add_argument("--tta", action="store_true",
                   help="test-time augmentation (multi-scale flip for "
                        "BaseNet, flip-averaging for U-Net models)")
    extra, _ = p.parse_known_args(argv)

    if extra.torch_ckpt:
        engine = InferenceEngine.from_torch(cfg, extra.torch_ckpt,
                                            tta=extra.tta)
    else:
        engine = InferenceEngine(
            cfg, extra.ckpt or os.path.join(cfg.run.out_dir, "checkpoints"),
            tta=extra.tta)

    if extra.export:
        engine.export(extra.export)
        print(f"exported deployment artifact -> {extra.export} "
              f"({os.path.getsize(extra.export)} bytes)")
        return
    if not (extra.images and extra.out):
        p.error("--images and --out are required (or use --export)")

    os.makedirs(extra.out, exist_ok=True)
    names = sorted(os.listdir(extra.images))
    h, w = cfg.data.image_size
    imgs, kept = [], []
    for n in names:
        img = cv2.imread(os.path.join(extra.images, n))
        if img is None:
            continue
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        imgs.append(cv2.resize(img, (w, h),
                               interpolation=cv2.INTER_NEAREST))
        kept.append(n)
    batch = np.stack(imgs)
    t0 = time.perf_counter()
    masks, _ = engine.predict(batch)
    dt = time.perf_counter() - t0
    for n, m in zip(kept, masks):
        stem = os.path.splitext(n)[0]
        cv2.imwrite(os.path.join(extra.out, f"{stem}_mask.png"),
                    m.astype(np.uint8))
        cv2.imwrite(os.path.join(extra.out, f"{stem}_viz.png"),
                    cv2.cvtColor(colorize(m), cv2.COLOR_RGB2BGR))
    if extra.uncertainty:
        for n, u in zip(kept, engine.uncertainty(batch)):
            stem = os.path.splitext(n)[0]
            um = (255 * u / max(float(u.max()), 1e-8)).astype(np.uint8)
            cv2.imwrite(os.path.join(extra.out, f"{stem}_uncert.png"),
                        cv2.applyColorMap(um, cv2.COLORMAP_JET))
    print(f"processed {len(kept)} images in {dt:.2f}s "
          f"({len(kept) / dt:.1f} imgs/s) -> {extra.out}")


if __name__ == "__main__":
    main()
