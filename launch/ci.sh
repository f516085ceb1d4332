#!/bin/bash
# Full CI gate: the default (fast) suite AND the slow scan-heavy suite.
# pytest.ini excludes `-m slow` from bare `pytest tests/` so interactive runs
# stay inside a 5-minute budget on a 1-core host; this script is the enforced
# "CI runs both" path — every end-to-end compile-heavy case (eval runner,
# validate runner, mode variants, serve, full-model parity, KNARPE kernels,
# loss golden, gradient-flow, rollout-train, RNN-mode, model-axis TP) lives
# behind the slow marker.
set -e
cd "$(dirname "$0")/.."
# The default tier is the regression safety net and must stay runnable inside
# a review window: enforce the 6-minute cold budget (5-min target + margin for
# slower hosts). If this trips, re-tier marks — don't raise the bound.
timeout 360 python -m pytest tests/ -q "$@" || {
  rc=$?
  if [ "$rc" -eq 124 ]; then
    echo "FAIL: default (not slow) suite exceeded its 360 s budget — re-tier marks" >&2
  fi
  exit "$rc"
}
python -m pytest tests/ -m slow -q "$@"
