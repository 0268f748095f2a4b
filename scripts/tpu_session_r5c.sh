#!/bin/bash
# Round-5c: A/B the ConvBlock flat island (UAPS_FLAT_BLOCKS — whole
# block on the kernels' native [B,C,H*W] lane view; the 4-D<->flat
# boundary reshapes were 7.17 ms/step in the r5a profile) on top of the
# new dwmf-head default (r5b: 75.2 -> 72.9). Run with an IDLE host.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== legs: control (4-D blocks), flat island ==="
timeout 4000 python -u scripts/tpu_step_ab.py auto@flatblk=0 \
    auto@flatblk=1 2>&1 | tail -6

echo "=== session done ==="
