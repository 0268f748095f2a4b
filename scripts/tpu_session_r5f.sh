#!/bin/bash
# Round-5f: A/B the dh-in-K one-matmul forward (UAPS_DWK=1) against the
# r5 default. Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== legs: default, dwk ==="
timeout 4000 python -u scripts/tpu_step_ab.py auto auto@dwk=1 2>&1 | tail -5

echo "=== session done ==="
