#!/bin/bash
# Round-5e: validate the new defaults (dwmf head + flat island + slab
# 64) across ALL EIGHT method trainers on the real chip, then refresh
# the serving headline. Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== per-method step timings (all 8) ==="
timeout 9000 python -u scripts/tpu_methods_bench.py 2>&1 | tail -14

echo "=== serve bench ==="
timeout 2400 python -u scripts/tpu_serve_bench.py BENCH_serve_r05.json 2>&1 | tail -6

echo "=== session done ==="
