#!/bin/bash
# Round-4a TPU measurement session (VERDICT r3 #1 + #2):
#   - conv_backend=chain: the fused ConvBlock chain kernels
#     (pallas/block_conv.py — BN moments free from conv accumulators,
#     prologue-fused normalize+leaky+dropout, single fused dgrad+wgrad
#     backward). All 6 kernels compile-probed OK on-chip first
#     (scripts/tpu_chain_probe.py, r4).
#   - packed_heads=1: the 4 decoders' out_conv heads as ONE
#     block-diagonal conv (each Cout=4 head wastes ~97% of MXU rows).
# Run with an IDLE host (no pytest / background trainings) — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== pool bwd probe (f32-arithmetic mask rewrite) ==="
timeout 1800 python -u scripts/tpu_pool_probe.py 2>&1 | grep -E "OK|FAILED|>>"

echo "=== legs in one process: control, chain, pack, chain+pack, pool ==="
timeout 5400 python -u scripts/tpu_step_ab.py \
    auto chain auto@pack=1 chain@pack=1 auto@pool=pallas 2>&1 | tail -12

echo "=== session done ==="
