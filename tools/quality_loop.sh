#!/usr/bin/env bash
# Mask-quality loop: synthetic corpus -> train SAM2 from scratch on TPU ->
# detect-tissue on held-out slides -> score vs truth (and vs a random-weights
# baseline). Reproduces the round-3 numbers in docs/TRAINING.md §5.
#
# Usage: bash tools/quality_loop.sh [WORKDIR]   (default /tmp/qloop)
#
# SEG_INPUT_SIZE=<px> (default 1024) trains AND evaluates at a reduced SAM2
# input resolution — the evidence gate for lowering --seg-input-size in
# production (e.g. 512 is ~4x less trunk compute on <=1024px thumbnails).
# EPOCHS=<n> overrides the training length.
set -ex
QL=${1:-/tmp/qloop}
SEG_INPUT_SIZE=${SEG_INPUT_SIZE:-1024}
EPOCHS=${EPOCHS:-20}
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
rm -rf "$QL"; mkdir -p "$QL"

# 1. corpora: train thumbnails at 1024x768; eval "slides" at 4096x3072 so the
#    detect-tissue thumbnail (mag 5 / power 1.25 => ds 4) lands at 1024x768.
python -m atlaspatch_tpu.tools.synthetic_corpus "$QL/train" --n 96 --seed 0
python -m atlaspatch_tpu.tools.synthetic_corpus "$QL/eval" --n 16 \
  --width 4096 --height 3072 --seed 5000 --prefix ev
( echo "wsi,mpp"; for f in "$QL"/eval/images/*.png; do echo "$(basename "$f"),1.5"; done ) \
  > "$QL/eval_mpp.csv"

# 2. full training from random init on TPU at 1024^2 (~30 min through the
#    tunneled dev chip; --trainable norms is the reference recipe when
#    starting from pretrained SAM2 weights instead)
ATLASPATCH_ALLOW_RANDOM_WEIGHTS=1 python -m atlaspatch_tpu.cli finetune-sam2 \
  "$QL/train/images" --masks "$QL/train/masks" --output "$QL/run" \
  --epochs "$EPOCHS" --batch-size 4 --trainable all --learning-rate 3e-4 \
  --image-size "$SEG_INPUT_SIZE" \
  --lr-schedule cosine --warmup-steps 30 --val-fraction 0.15 --augment --seed 0 -v

# 3. trained predictions on held-out slides
python -m atlaspatch_tpu.cli detect-tissue "$QL/eval/images" \
  --output "$QL/pred_trained" --seg-batch-size 16 \
  --seg-input-size "$SEG_INPUT_SIZE" \
  --mpp-csv "$QL/eval_mpp.csv" --sam2-checkpoint "$QL/run/sam2_finetuned.npz"

# 4. random-weights baseline predictions
ATLASPATCH_ALLOW_RANDOM_WEIGHTS=1 python -m atlaspatch_tpu.cli detect-tissue \
  "$QL/eval/images" --output "$QL/pred_random" --seg-batch-size 16 \
  --seg-input-size "$SEG_INPUT_SIZE" \
  --mpp-csv "$QL/eval_mpp.csv"

# 5. score
echo '=== TRAINED ==='
python -m atlaspatch_tpu.cli evaluate-masks "$QL/pred_trained/visualization" \
  --truth "$QL/eval/masks" --csv "$QL/trained.csv"
echo '=== RANDOM BASELINE ==='
python -m atlaspatch_tpu.cli evaluate-masks "$QL/pred_random/visualization" \
  --truth "$QL/eval/masks" --csv "$QL/random.csv"
