#!/bin/bash
# Round-5g: confirm the dwk default in a fresh process, refresh the
# profile and the bench headline. Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== step at final defaults ==="
timeout 2400 python -u scripts/tpu_step_ab.py auto 2>&1 | tail -3

echo "=== fresh profile ==="
timeout 2400 python -u scripts/tpu_profile.py auto /tmp/prof_r5g 2>&1 | head -16

echo "=== bench.py headline ==="
timeout 1800 python -u bench.py 2>/dev/null

echo "=== session done ==="
