#!/bin/bash
# Round-3a TPU measurement session: A/B the three optimizations that
# shipped in r2 with defaults off and no on-chip numbers (VERDICT #3):
#   - pool_backend=pallas (pallas/pool_nchw.py, targets the ~3.8 ms
#     select-and-scatter transpose chain)
#   - bn_backend=flat (BN stats on the conv's flat [B,C,HW] output)
#   - UAPS_CONV_INFUSE / UAPS_CONV_DIMSEM compiler params (per-process)
# Run with an IDLE host (no pytest / background trainings) — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== legs in one process: control, pool=pallas, bn=flat, both ==="
timeout 3000 python -u scripts/tpu_step_ab.py \
    auto auto@pool=pallas auto@bn=flat auto@pool=pallas,bn=flat 2>&1 | tail -8

echo "=== INFUSE=1 (Mosaic input fusion of the feeding pad) ==="
UAPS_CONV_INFUSE=1 timeout 900 python -u scripts/tpu_step_ab.py auto 2>&1 | tail -3

echo "=== DIMSEM=1 (parallel fwd grid dims) ==="
UAPS_CONV_DIMSEM=1 timeout 900 python -u scripts/tpu_step_ab.py auto 2>&1 | tail -3

echo "=== session done ==="
