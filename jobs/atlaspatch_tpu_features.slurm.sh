#!/bin/bash
# Patch feature embedding into existing per-slide H5s on a TPU host.
# Safe to run many copies concurrently: per-slide phase=features locks +
# complete-feature row-count checks make the job idempotent and elastic.
#SBATCH --job-name=atlaspatch-tpu-features
#SBATCH --cpus-per-task=8
#SBATCH --mem=64G
#SBATCH --time=24:00:00

set -euo pipefail

WSI_DIR=${WSI_DIR:?set WSI_DIR to the slide directory}
OUT_DIR=${OUT_DIR:?set OUT_DIR to the output root}
EXTRACTORS=${EXTRACTORS:-uni_v1}

python -m atlaspatch_tpu.cli process "$WSI_DIR" \
  --output "$OUT_DIR" \
  --patch-size 256 \
  --target-mag 20 \
  --device tpu \
  --feature-extractors "$EXTRACTORS" \
  --feature-batch-size 64 \
  --feature-precision float16 \
  --seg-batch-size 32 \
  --skip-existing
