#!/bin/bash
# Auto-restarting trainer for preemptible/spot TPU VMs.
#
# Wraps launch/train_tpu.sh in a retry loop: every launch passes resume=true
# (the very first run finds no checkpoint and starts fresh; see run.py fit()),
# and a preemption at ANY instant is safe —
#   - SIGTERM mid-step: fit() checkpoints "last" after the in-flight step and
#     main exits 143 (graceful path — NOT a clean finish, so the loop
#     relaunches; only completing max_epochs exits 0),
#   - hard kill mid-save: the checkpoint tmp->final swap keeps either the old
#     or the new "last" restorable (train/checkpoint.py),
#   - mid-epoch relaunch: loaders replay the interrupted epoch's exact
#     permutation and skip by index, so no data is dropped or repeated.
#
# Exit conditions: a clean exit after max_epochs stops the loop; anything
# else (crash or graceful preemption) restarts after BACKOFF seconds, up to
# MAX_RESTARTS restarts (i.e. at most MAX_RESTARTS+1 launches).
set -uo pipefail

MAX_RESTARTS=${MAX_RESTARTS:-100}
BACKOFF=${BACKOFF:-30}

here="$(cd "$(dirname "$0")" && pwd)"
restarts=0
while true; do
  "$here/train_tpu.sh" resume=true "$@"
  rc=$?
  if [ $rc -eq 0 ]; then
    echo "training finished cleanly (after $restarts restarts)"
    exit 0
  fi
  if [ $restarts -ge "$MAX_RESTARTS" ]; then
    echo "giving up after $restarts restarts (last rc=$rc)" >&2
    exit $rc
  fi
  restarts=$((restarts + 1))
  echo "training exited rc=$rc — restarting with resume=true in ${BACKOFF}s (restart $restarts/$MAX_RESTARTS)" >&2
  sleep "$BACKOFF"
done
