#!/bin/bash
# Round-5a: re-establish the r4 75.5 ms baseline in this session, take a
# fresh op-level profile at the current defaults (dwmf + dwnp1f + pallas
# pool), and refresh the bench headline. Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== step baseline (current defaults) ==="
timeout 2400 python -u scripts/tpu_step_ab.py auto 2>&1 | tail -4

echo "=== fresh profile ==="
timeout 2400 python -u scripts/tpu_profile.py auto /tmp/prof_r5a 2>&1 | tail -40

echo "=== bench.py headline ==="
timeout 1800 python -u bench.py 2>/dev/null

echo "=== session done ==="
