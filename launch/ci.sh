#!/bin/bash
# Full CI gate: the default (fast) suite AND the slow scan-heavy suite.
# pytest.ini excludes `-m slow` from bare `pytest tests/` so interactive runs
# fit a 10-minute budget; this script is the enforced "CI runs both" path —
# the end-to-end loss golden, gradient-flow, rollout-train, RNN-mode, and
# model-axis TP tests all live behind the slow marker.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q "$@"
python -m pytest tests/ -m slow -q "$@"
