#!/bin/bash
# Round-5b: A/B the Co-padded packed head (head_variant=dwmf — Cout 4
# zero-padded to 8 inside the packed kernels, unlocking the 3x
# matmul-count win for the out_conv heads profiled at 7.96 ms/24 calls
# in r5a), plus a bn_backend=flat retest now that conv outputs are
# genuinely flat (dwmf). Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== legs: control, head=dwmf, bn=flat ==="
timeout 4500 python -u scripts/tpu_step_ab.py auto auto@head=dwmf \
    auto@bn=flat 2>&1 | tail -8

echo "=== session done ==="
