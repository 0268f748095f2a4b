#!/bin/bash
# Round-4c TPU session: wgrad anatomy + serve bench (fixed) + headline.
# Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== wgrad anatomy at the hot 256px conv1 shape ==="
timeout 3000 python -u scripts/tpu_wgrad_anatomy.py 2>&1 | grep -v WARNING

echo "=== serve bench -> BENCH_serve_r04.json ==="
timeout 1800 python -u scripts/tpu_serve_bench.py BENCH_serve_r04.json 2>&1 | grep -v WARNING | tail -6

echo "=== bench.py headline ==="
timeout 1800 python -u bench.py 2>/dev/null

echo "=== session done ==="
