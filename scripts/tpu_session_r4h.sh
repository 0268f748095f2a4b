#!/bin/bash
# Round-4h: head-variant A/B on the new dwm default + fresh profile +
# headline refresh. Run with an IDLE host — CLAUDE.md.
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo || exit 1

echo "=== legs in one process: control (dwm), head=dwnp ==="
timeout 3000 python -u scripts/tpu_step_ab.py auto auto@head=dwnp 2>&1 | tail -6

echo "=== profile at the dwm default ==="
timeout 1800 python -u scripts/tpu_profile.py auto /tmp/uaps_profile_r4h 2>&1 | grep -v WARNING | head -32

echo "=== bench.py headline ==="
timeout 1800 python -u bench.py 2>/dev/null

echo "=== session done ==="
