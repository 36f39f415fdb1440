#!/bin/bash
# Tissue segmentation + patch-coordinate extraction on a TPU host.
# Submit N identical copies for a cohort: per-slide lock files on the shared
# filesystem self-shard the work (same protocol as the reference's SLURM
# templates — SURVEY.md §2 rows 52-53). For TPU pods, additionally export
# ATLASPATCH_NUM_HOSTS / ATLASPATCH_HOST_ID (or rely on jax.distributed) for
# static host sharding.
#SBATCH --job-name=atlaspatch-tpu-patch
#SBATCH --cpus-per-task=8
#SBATCH --mem=64G
#SBATCH --time=24:00:00

set -euo pipefail

WSI_DIR=${WSI_DIR:?set WSI_DIR to the slide directory}
OUT_DIR=${OUT_DIR:?set OUT_DIR to the output root}

python -m atlaspatch_tpu.cli segment-and-get-coords "$WSI_DIR" \
  --output "$OUT_DIR" \
  --patch-size 256 \
  --target-mag 20 \
  --device tpu \
  --seg-batch-size 32 \
  --patch-workers "${SLURM_CPUS_PER_TASK:-8}" \
  --max-open-slides 200 \
  --skip-existing
