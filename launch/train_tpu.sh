#!/bin/bash
# Train the flagship 10M model on a TPU pod slice.
# Parity target: /root/reference/bash/train.sh (SLURM 4x RTX4090 launcher).
# On TPU VMs there is no SLURM srun: one process per host, GSPMD handles the
# rest. For multi-host slices run this same script on every worker
# (e.g. `gcloud compute tpus tpu-vm ssh ... --worker=all --command=...`);
# jax.distributed initializes from the TPU environment automatically, each
# host loads a disjoint dataset shard (DistributedSampler semantics — so
# DATA_DIR can be a per-host local-SSD copy of the SAME packed dataset), and
# rank 0 alone finalizes checkpoints/submissions (CKPT_DIR must be shared
# storage on multi-host jobs).
set -euo pipefail

DATA_DIR=${DATA_DIR:?set DATA_DIR to the packed h5/tbcache directory}
CKPT_DIR=${CKPT_DIR:-ckpt}

# copy the dataset to local SSD first if it lives on slow network storage
# (the reference's $TMPDIR copy step)
export JAX_PLATFORMS=${JAX_PLATFORMS:-tpu,cpu}

python -m trafficbotsv15_tpu.run \
  action=fit data=h5 data_dir="$DATA_DIR" ckpt_dir="$CKPT_DIR" \
  "$@"
