#!/bin/bash
# Round-4d: packed-wgrad probes (g3/one) + fixed serve bench.
# Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== packed wgrad probes at the hot shape ==="
timeout 2400 python -u scripts/tpu_wgrad_anatomy.py roll g3 one 2>&1 | grep -v WARNING

echo "=== serve bench -> BENCH_serve_r04.json ==="
timeout 1800 python -u scripts/tpu_serve_bench.py BENCH_serve_r04.json 2>&1 | grep -vE "WARNING|^\s*File|^\s*\^|Traceback" | tail -8

echo "=== session done ==="
