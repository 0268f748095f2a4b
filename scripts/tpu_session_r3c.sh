#!/bin/bash
# Round-3c TPU session: the production-shape quality evidence (VERDICT
# r2 #1b + #7). Serialized on the one chip + one host core:
#   1) quality_run baseline  — faithful 800x60 schedule, 256², hard pools
#   2) quality_run uaps      — same schedule (ramps/plateau in-regime)
#   3) ablations.py          — labeled-ratio x {baseline,uaps} + n_aux
# Not timing-critical (quality metrics only), but keep heavy CPU jobs
# off the host anyway: every epoch is one relay dispatch.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== quality_run baseline ==="
timeout 10800 python -u scripts/quality_run.py baseline 800 \
    runs/quality_baseline 2>&1 | grep -v "^I0000" | tail -30

echo "=== quality_run uaps ==="
timeout 14400 python -u scripts/quality_run.py uaps 800 \
    runs/quality_uaps_r3 2>&1 | grep -v "^I0000" | tail -30

echo "=== ablations ==="
timeout 10800 python -u scripts/ablations.py 2>&1 | grep "RESULT\|ALL"

echo "=== r3c done ==="
