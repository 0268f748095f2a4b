"""Bisect the KoSDD2 256x512 Mosaic compile failure (r3c discovery).

preset_exercise.py tpu: dagm/mtiles compile + step fine at 256x256, but
kosdd2 (2 classes, bs12, 256x512 landscape) dies in remote_compile with
HTTP 500 / tpu_compile_helper exit 1 — a Mosaic rejection somewhere in
the Pallas kernel set at the non-square geometry.

Legs (one process; each leg ~1 jit signature):
  1. conv_backend=xla          — no pallas convs: isolates conv kernels
  2. dropout_backend=xla + 1   — also no perturb kernels
  3. fused_uncertainty=False + 2 — no uncertainty kernel either
  4. standalone conv3x3 fwd+bwd at [12, 16, 256, 512] — direct extract
  5. standalone at [12, 16, 128, 256] (the level-2 NCHW island shape)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/tpu_kosdd2_bisect.py [leg...]
"""
import dataclasses
import sys
import traceback

sys.path.insert(0, "/root/repo")


def _preset_step(**model_overrides):
    import jax
    import numpy as np
    from uaps_tpu.utils.config import preset
    from uaps_tpu.train import Trainer
    from uaps_tpu.data.synthetic import SyntheticDefects

    cfg = preset("kosdd2")
    cfg.data = dataclasses.replace(cfg.data, name="synthetic",
                                   image_root="", mask_root="")
    cfg.model = dataclasses.replace(cfg.model, compute_dtype="bfloat16",
                                    **model_overrides)
    data = SyntheticDefects(cfg.data, seed=0, labeled_pool=24,
                            unlabeled_pool=24, val_pool=12)
    tr = Trainer(cfg, data=data)
    batch = next(data.train_iter())
    state, metrics = tr.train_step(tr.state, jax.device_put(batch))
    return float(metrics["loss"])


def _standalone_conv(shape):
    import jax
    import jax.numpy as jnp
    import numpy as np
    from uaps_tpu.pallas.conv3x3_nchw import conv3x3_nchw

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[1], 16)) * 0.1,
                    jnp.bfloat16)

    def f(x, w):
        return jnp.sum(conv3x3_nchw(x, w, variant="dwnp")
                       .astype(jnp.float32))

    v, g = jax.value_and_grad(f, argnums=(0, 1))(x, w)
    return float(v)


LEGS = {
    "xlaconv": lambda: _preset_step(conv_backend="xla"),
    "xlaconv+xladrop": lambda: _preset_step(conv_backend="xla",
                                            dropout_backend="xla"),
    "pallasconv": lambda: _preset_step(),   # control: should fail
    "conv_512": lambda: _standalone_conv((12, 16, 256, 512)),
    "conv_256": lambda: _standalone_conv((12, 16, 128, 256)),
}


def main():
    picks = [a for a in sys.argv[1:] if a in LEGS] or list(LEGS)
    for name in picks:
        print(f"=== leg {name} ===", flush=True)
        try:
            out = LEGS[name]()
            print(f"OK {name}: {out}", flush=True)
        except Exception as e:  # noqa: BLE001 — we want the Mosaic text
            msg = str(e)
            print(f"FAIL {name}: {type(e).__name__}: {msg[:3000]}",
                  flush=True)
            if "DUMP" in msg or True:
                traceback.print_exc(limit=3)


if __name__ == "__main__":
    main()
