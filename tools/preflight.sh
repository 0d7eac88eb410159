#!/bin/sh
# Round-exit gate: MUST pass before the end-of-round commit.
#
# Runs the full non-slow suite (the slow trio — full-scale model configs,
# run-level torch oracles — is opt-in via PREFLIGHT_SLOW=1). Any warning
# attributed to a srbh_tpu module is an error (pyproject filterwarnings),
# so feature evolutions that stale out an old expectation or introduce
# warning rot fail HERE instead of shipping red.
#
# Usage:  sh tools/preflight.sh            # ~10 min, the gate
#         PREFLIGHT_SLOW=1 sh tools/preflight.sh   # full sweep (~85 min)
set -e
cd "$(dirname "$0")/.."
if [ "${PREFLIGHT_SLOW:-0}" = "1" ]; then
    exec python -m pytest tests/ -q
else
    exec python -m pytest tests/ -q -m "not slow"
fi
