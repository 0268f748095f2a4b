#!/bin/bash
# Round-4b TPU session: runs after r4a's step A/Bs pick the winner.
#   $1 = the winning step_ab variant string (e.g. 'chain@pack=1');
#        defaults to 'auto'.
# 1. op-level profile of the winning config (tpu_profile.py)
# 2. serving-latency headline -> BENCH_serve_r04.json (VERDICT r3 #6)
# Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
WIN="${1:-auto}"

echo "=== profile of winning config: $WIN ==="
timeout 1800 python -u scripts/tpu_profile.py "$WIN" 2>&1 | tail -40

echo "=== serve bench -> BENCH_serve_r04.json ==="
timeout 1800 python -u scripts/tpu_serve_bench.py BENCH_serve_r04.json 2>&1 | tail -6

echo "=== session done ==="
