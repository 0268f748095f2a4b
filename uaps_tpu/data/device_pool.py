"""Device-resident fixed-pool sampling: fold the data pipeline into XLA.

Why this exists: this environment reaches its TPU through a loopback
relay whose effective host->device bandwidth cannot feed 256² two-stream
batches (measured 2026-08-19: the faithful UAPS step runs 358 imgs/s on
a device-resident batch, but a host-fed Trainer epoch crawls at 9-13
imgs/s — >95% of wall time was batch upload). The reference hides the
same class of problem behind 8 DataLoader workers + pinned memory
(utilities/dataloaders.py:116-119); the TPU-native answer, per the
scaling playbook's "minimise host↔device transfers", is stronger:

 * the FINITE split pools (the reference's labeled/unlabeled/val sets
   are finite too — sklearn splits, dataloaders.py:52-53) are pushed to
   HBM ONCE (~1.3 GB for the 256² quality-run dataset vs 16 GB HBM);
 * per-step batch sampling (uniform-with-replacement, the synthetic
   sampler's semantics) becomes `jax.random.randint` + `jnp.take`
   INSIDE the jitted epoch program;
 * one `lax.scan` runs a whole epoch per dispatch: zero per-step host
   traffic, one host round-trip per epoch.

Used by Trainer when `RunConfig.device_pools` is set and the dataset
carries fixed pools (scripts/quality_run.py, scripts/ablations.py).
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def put_pools(data) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Upload the labeled + unlabeled pools of a SyntheticDefects-like
    dataset (attrs ``_pool``/``_upool``) to the default device."""
    lab, unlab = data._pool, data._upool
    return (jax.device_put(lab["image"]), jax.device_put(lab["label"]),
            jax.device_put(unlab["image"]), jax.device_put(unlab["label"]))


def make_pool_epoch(step_fn: Callable, batch_size: int, n_steps: int,
                    donate: bool = True,
                    weak_strong: bool = False) -> Callable:
    """Jitted epoch: scan `step_fn` over n_steps batches sampled on
    device from the resident pools.

    ``weak_strong=True`` adds the UCC-style strong view on device
    (weak + N(0, 0.1) jitter — the synthetic fixture's strong aug,
    SyntheticDefects.train_iter_weak_strong).

    Returns fn(state, key, lab_img, lab_lbl, un_img, un_lbl)
    -> (state, metrics stacked [n_steps])."""

    def epoch(state, key, lab_img, lab_lbl, un_img, un_lbl):
        n_lab = lab_img.shape[0]
        n_un = un_img.shape[0]

        def body(st, k):
            kl, ku, ks = jax.random.split(k, 3)
            il = jax.random.randint(kl, (batch_size,), 0, n_lab)
            iu = jax.random.randint(ku, (batch_size,), 0, n_un)
            batch = {
                "image": jnp.take(lab_img, il, axis=0),
                "label": jnp.take(lab_lbl, il, axis=0),
                "uimage": jnp.take(un_img, iu, axis=0),
                "ulabel": jnp.take(un_lbl, iu, axis=0),
            }
            if weak_strong:
                batch["uimage_strong"] = batch["uimage"] + \
                    0.1 * jax.random.normal(ks, batch["uimage"].shape,
                                            batch["uimage"].dtype)
            return step_fn(st, batch)

        keys = jax.random.split(key, n_steps)
        return jax.lax.scan(body, state, keys)

    return jax.jit(epoch, donate_argnums=(0,) if donate else ())


def make_pool_eval(eval_step: Callable, batch_size: int) -> Callable:
    """Jitted full-pool eval sweep: fn(params, batch_stats, img, lbl)
    -> metric dict averaged over the pool's batches (sequential slices,
    matching SyntheticDefects._sweep / the reference's val_loader
    order). Pool size must be a batch multiple (quality-run pools are)."""

    def sweep(params, bstats, img, lbl):
        nb = img.shape[0] // batch_size
        bi = img[:nb * batch_size].reshape(nb, batch_size, *img.shape[1:])
        bl = lbl[:nb * batch_size].reshape(nb, batch_size, *lbl.shape[1:])

        def body(carry, b):
            m = eval_step(params, bstats, {"image": b[0], "label": b[1]})
            return carry, m

        _, ms = jax.lax.scan(body, 0, (bi, bl))
        # plain mean over batches — identical to Trainer.validate's
        # host-side sum/len over the same sequential batches
        return jax.tree.map(lambda a: jnp.mean(a, axis=0), ms)

    return jax.jit(sweep)
