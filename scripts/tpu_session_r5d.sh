#!/bin/bash
# Round-5d: confirm the new defaults (dwmf head + flat island, r5b/r5c:
# 75.2 -> 64.5 ms/step), sweep the slab size (bigger slabs amortize the
# per-matmul fixed cost and the roll epilogue), refresh the profile and
# the bench headline. Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== legs: default, slab=64 ==="
timeout 4000 python -u scripts/tpu_step_ab.py auto auto@slab=64 2>&1 | tail -5

echo "=== fresh profile (default) ==="
timeout 2400 python -u scripts/tpu_profile.py auto /tmp/prof_r5d 2>&1 | head -30

echo "=== bench.py headline ==="
timeout 1800 python -u bench.py 2>/dev/null

echo "=== session done ==="
