#!/bin/bash
# Continuation of tpu_session_r3c.sh after a relay stall killed the
# uaps quality run mid-flight (epoch ~386; a lost in-flight relay
# response left the client blocked in a socket read forever — fresh
# processes reached the TPU fine). Resumes from the last checkpoint
# and runs the remaining stages. stdbuf keeps the log live.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1
FILTER='WARNING|^I0000|InitializeLog|oneDNN|cudart'

echo "=== quality_run uaps (resume) ==="
timeout 9000 stdbuf -oL -eL python -u scripts/quality_run.py uaps 800 \
    runs/quality_uaps_r3 --resume 2>&1 | stdbuf -oL grep -vE "$FILTER"

echo "=== ablations ==="
timeout 9000 stdbuf -oL -eL python -u scripts/ablations.py 2>&1 \
    | stdbuf -oL grep -vE "$FILTER"

echo "=== preset_exercise tpu ==="
timeout 5400 stdbuf -oL -eL python -u scripts/preset_exercise.py tpu 2>&1 \
    | stdbuf -oL grep -vE "$FILTER"

echo "=== r3c2 done ==="
