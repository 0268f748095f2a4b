#!/bin/bash
# Round-3b TPU session: (1) wgrad-variant step A/Bs (VERDICT #4 — the
# 256px wgrad is the heaviest single conv call; UAPS_WGRAD_VARIANT is
# read at trace time, so one process per leg), (2) DAGM/MTiles/KoSDD2
# faithful steps at real geometry (VERDICT #6), (3) standalone compile
# of the pool kernel to extract the real Mosaic error behind the r3a
# HTTP-500 failure. Run with an IDLE host.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

for wg in im2col dhdw taps; do
  echo "=== wgrad=$wg (control today: auto=89.6) ==="
  UAPS_WGRAD_VARIANT=$wg timeout 900 python -u scripts/tpu_step_ab.py auto 2>&1 | tail -3
done

echo "=== preset steps (dagm / mtiles / kosdd2) ==="
timeout 2400 python -u scripts/preset_exercise.py tpu 2>&1 | tail -8

echo "=== pool kernel standalone compile (error extraction) ==="
timeout 900 python -u - <<'EOF' 2>&1 | tail -30
import numpy as np, jax, jax.numpy as jnp
from uaps_tpu.pallas.pool_nchw import max_pool_2x2_nchw
x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (4, 16, 256, 256)) * 0.1, jnp.bfloat16)
try:
    y = max_pool_2x2_nchw(x)
    print("fwd ok:", y.shape, float(jnp.sum(y.astype(jnp.float32))))
except Exception as e:
    print("FWD FAIL:", type(e).__name__, str(e)[:2000])
try:
    g = jax.grad(lambda a: jnp.sum(
        max_pool_2x2_nchw(a).astype(jnp.float32)))(x)
    print("bwd ok:", g.shape, float(jnp.sum(g.astype(jnp.float32))))
except Exception as e:
    print("BWD FAIL:", type(e).__name__, str(e)[:2000])
EOF

echo "=== session done ==="
