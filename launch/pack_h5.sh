#!/bin/bash
# Pack WOMD TFRecords into the h5 dataset (CPU job).
# Parity target: /root/reference/bash/pack_h5.sh — but parallel: the packer
# runs a worker pool (--workers) instead of a single process.
set -euo pipefail

WOMD_DIR=${WOMD_DIR:?set WOMD_DIR to womd_scenario_v_1_2_0}
OUT_DIR=${OUT_DIR:?set OUT_DIR}
DATASET=${DATASET:-training}
WORKERS=${WORKERS:-$(nproc)}

python scripts/pack_h5_womd.py \
  --data-dir "$WOMD_DIR" --dataset "$DATASET" --out-dir "$OUT_DIR" --workers "$WORKERS" "$@"

# optional: convert to the TBCache binary format for the native loader
# python -c "from trafficbotsv15_tpu.data.tbcache import convert_h5; from trafficbotsv15_tpu.data.h5_dataset import tensor_size_train; from trafficbotsv15_tpu.config import DataCfg; convert_h5('$OUT_DIR/$DATASET.h5', '$OUT_DIR/$DATASET.tbcache', tensor_size_train(DataCfg()))"
