#!/bin/bash
# Generate WOMD + WOSAC submissions from the best checkpoint.
# Parity target: /root/reference/bash/submission.sh (K=128 futures override).
set -euo pipefail

DATA_DIR=${DATA_DIR:?set DATA_DIR to the packed h5 directory}
CKPT_DIR=${CKPT_DIR:-ckpt}
export JAX_PLATFORMS=${JAX_PLATFORMS:-tpu,cpu}

python -m trafficbotsv15_tpu.run \
  action=test data=h5 data_dir="$DATA_DIR" ckpt_dir="$CKPT_DIR" \
  batch_size_test=3 \
  "$@"
