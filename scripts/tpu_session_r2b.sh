#!/bin/bash
# Round-2b TPU measurement session: fresh profile at the dwnp default +
# the staged compiler-param experiments (UAPS_CONV_INFUSE / _DIMSEM are
# read once at import, so each A/B leg is its own process).
# Run with an IDLE host (no pytest / background trainings) — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== control: step time, auto (dwnp default) ==="
timeout 900 python -u scripts/tpu_step_ab.py auto 2>&1 | tail -4

echo "=== INFUSE=1 (Mosaic input fusion of the feeding pad) ==="
UAPS_CONV_INFUSE=1 timeout 900 python -u scripts/tpu_step_ab.py auto 2>&1 | tail -4

echo "=== DIMSEM=1 (parallel fwd grid dims) ==="
UAPS_CONV_DIMSEM=1 timeout 900 python -u scripts/tpu_step_ab.py auto 2>&1 | tail -4

echo "=== profile: op-level breakdown at dwnp default ==="
timeout 1200 python -u scripts/tpu_profile.py auto /tmp/prof_r2b 2>&1 | tail -40

echo "=== session done ==="
