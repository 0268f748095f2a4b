#!/usr/bin/env bash
# Tiered CI (VERDICT r3 #7) — makes "everything green" provable in
# minutes. All tiers run on CPU (tests/conftest.py forces an 8-device
# virtual mesh); on-chip work lives in scripts/tpu_*.py (marker: tpu).
#
#   ./scripts/ci.sh fast    ~1.5 min  pure-function unit tests
#   ./scripts/ci.sh unit    ~60 min   models/methods/pallas/eval/serve,
#                                     methods e2e + multichip convergence
#                                     (r5 measured: models/pallas/knobs
#                                     45 min, the rest ~15)
#   ./scripts/ci.sh slow    ~6 min    torch-trajectory equivalence (all
#                                     8 methods)
#   ./scripts/ci.sh all               all three, in order
set -euo pipefail
cd "$(dirname "$0")/.."

tier() {
    local name=$1; shift
    local t0=$SECONDS
    echo "=== tier: $name ==="
    python -m pytest -q "$@"
    echo "=== tier $name OK in $((SECONDS - t0))s ==="
}

case "${1:-fast}" in
    fast) tier fast -m fast ;;
    unit) tier unit -m "not fast and not slow" ;;
    slow) tier slow -m slow ;;
    all)
        tier fast -m fast
        tier unit -m "not fast and not slow"
        tier slow -m slow
        ;;
    *) echo "usage: $0 {fast|unit|slow|all}" >&2; exit 2 ;;
esac
