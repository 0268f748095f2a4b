#!/bin/bash
# Round-3c TPU session: the production-shape quality evidence (VERDICT
# r2 #1b + #6 + #7). Serialized on the one chip + one host core:
#   1) quality_run baseline  — faithful 800x60 schedule, 256², hard pools
#   2) quality_run uaps      — same schedule (ramps/plateau in-regime)
#   3) ablations.py          — labeled-ratio x {baseline,uaps} + n_aux
#   4) preset_exercise tpu   — DAGM/MTiles/KoSDD2 faithful steps on-chip
# Not timing-critical (quality metrics only), but keep heavy CPU jobs
# off the host anyway: every epoch is one relay dispatch — EXCEPT the
# ablations' latency column and preset step timings (idle host there).
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
FILTER='WARNING|^I0000|InitializeLog|oneDNN|cudart'

echo "=== quality_run baseline ==="
timeout 7200 python -u scripts/quality_run.py baseline 800 \
    runs/quality_baseline 2>&1 | grep -vE "$FILTER"

echo "=== quality_run uaps ==="
timeout 12600 python -u scripts/quality_run.py uaps 800 \
    runs/quality_uaps_r3 2>&1 | grep -vE "$FILTER"

echo "=== ablations ==="
timeout 9000 python -u scripts/ablations.py 2>&1 | grep -vE "$FILTER"

echo "=== preset_exercise tpu ==="
timeout 5400 python -u scripts/preset_exercise.py tpu 2>&1 | grep -vE "$FILTER"

echo "=== r3c done ==="
