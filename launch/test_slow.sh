#!/bin/bash
# Scan-heavy training/rollout compile tests (excluded from the default suite
# by pytest.ini so `pytest tests/` fits a 10-minute budget on one CPU).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -m slow -q "$@"
