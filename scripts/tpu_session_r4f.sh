#!/bin/bash
# Round-4f: A/B the dwm forward (dw-in-M packed matmuls) on top of the
# new dwnp1 wgrad default, then refresh the bench headline.
# Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== legs in one process: control (dwnp+dwnp1), dwm ==="
timeout 3000 python -u scripts/tpu_step_ab.py auto auto@var=dwm 2>&1 | tail -6

echo "=== bench.py headline ==="
timeout 1800 python -u bench.py 2>/dev/null

echo "=== session done ==="
