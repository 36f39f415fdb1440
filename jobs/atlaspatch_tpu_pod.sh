#!/bin/bash
# Launch the pipeline across every worker of a Cloud TPU pod slice.
#
# The TPU-native counterpart of submitting N identical SLURM copies
# (reference: jobs/atlaspatch_patch.slurm.sh — N jobs self-shard on
# per-slide lock files; SURVEY.md §2 rows 52-53). On a pod slice each
# worker host runs the same command; work distribution combines:
#   * static host sharding — ATLASPATCH_NUM_HOSTS / ATLASPATCH_HOST_ID
#     are derived per worker so each host starts on a disjoint slice of
#     the cohort (atlaspatch_tpu/parallel/multihost.py), and
#   * lock-file elasticity — when a host finishes its shard it steals
#     unfinished slides from slower hosts through the same O_CREAT|O_EXCL
#     locks the reference uses, so stragglers cannot strand work.
#
# Requires: a TPU VM pod slice with this repo and the slide/output paths
# available on every worker (NFS/GCS-fuse), gcloud authenticated.
#
# Usage:
#   TPU_NAME=my-v5e-16 ZONE=us-west4-a WSI_DIR=/data/slides \
#     OUT_DIR=/data/out jobs/atlaspatch_tpu_pod.sh [extra CLI flags...]

set -euo pipefail

TPU_NAME=${TPU_NAME:?set TPU_NAME to the TPU pod slice name}
ZONE=${ZONE:?set ZONE to the GCE zone of the TPU}
WSI_DIR=${WSI_DIR:?set WSI_DIR to the slide directory}
OUT_DIR=${OUT_DIR:?set OUT_DIR to the output root}
REPO_DIR=${REPO_DIR:-'$HOME/atlaspatch-tpu'}
PATCH_SIZE=${PATCH_SIZE:-256}
TARGET_MAG=${TARGET_MAG:-20}

# Every worker gets the same command. Host count and index come from the
# TPU runtime via jax.distributed (one short probe process) — plain TPU VMs
# don't export a worker-id env var, so deriving both from JAX is the only
# portable source. Extra CLI flags are shell-quoted so values with spaces
# survive the ssh hop.
EXTRA=""
if [ "$#" -gt 0 ]; then
  EXTRA=$(printf "%q " "$@")
fi
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" --worker=all \
  --command "cd $REPO_DIR && \
    eval \$(python -c 'import jax; jax.distributed.initialize(); print(f\"export ATLASPATCH_NUM_HOSTS={jax.process_count()} ATLASPATCH_HOST_ID={jax.process_index()}\")' \
            2>/dev/null || echo 'export ATLASPATCH_NUM_HOSTS=1 ATLASPATCH_HOST_ID=0') && \
    python -m atlaspatch_tpu.cli segment-and-get-coords '$WSI_DIR' \
      --output '$OUT_DIR' \
      --patch-size $PATCH_SIZE \
      --target-mag $TARGET_MAG \
      --device tpu \
      --seg-batch-size 32 \
      --fast \
      --skip-existing $EXTRA"
