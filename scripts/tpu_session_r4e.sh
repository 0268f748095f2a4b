#!/bin/bash
# Round-4e: step A/B of the packed one-matmul wgrad (dwnp1).
# Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== control (auto) ==="
timeout 1500 python -u scripts/tpu_step_ab.py auto 2>&1 | tail -3
echo "=== UAPS_WGRAD_VARIANT=dwnp1 ==="
UAPS_WGRAD_VARIANT=dwnp1 timeout 1500 python -u scripts/tpu_step_ab.py auto 2>&1 | tail -3
echo "=== session done ==="
