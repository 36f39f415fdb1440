#!/usr/bin/env bash
# Networked-day weight validation: one command from "egress exists" to a
# committed drift report. This environment has no network, so the script is
# authored + dry-run-tested offline (docs/WEIGHTS.md "Residual gap"); run it
# for real on any machine with internet + an HF token for the gated models.
#
#   HF_TOKEN=hf_...  bash tools/fetch_and_verify.sh [WORKDIR] [name,name,...]
#   bash tools/fetch_and_verify.sh --dry-run          # print the plan only
#
# Per encoder family it:
#   1. downloads the checkpoint (huggingface_hub snapshot or torchvision URL)
#      into $ATLASPATCH_WEIGHTS_DIR (default WORKDIR/weights),
#   2. runs `verify-weights` (converter -> shape diff -> forward smoke ->
#      HF-config constant diff) over everything that landed,
#   3. snapshots features on the fixed drift-check batch
#      (atlaspatch_tpu/tools/drift_check.py) so a reference-side run of the
#      same batch closes the <1e-3 north-star with `drift_check compare`,
#   4. writes WORKDIR/WEIGHTS_REPORT.md — the skeleton to commit.
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"

DRY=0
if [ "${1:-}" = "--dry-run" ]; then DRY=1; shift || true; fi
WORK="${1:-/tmp/atlaspatch_weights}"
ONLY="${2:-all}"
export ATLASPATCH_WEIGHTS_DIR="${ATLASPATCH_WEIGHTS_DIR:-$WORK/weights}"
mkdir -p "$WORK" "$ATLASPATCH_WEIGHTS_DIR"

# name<TAB>source for every implemented zoo entry (the source field is the
# documented upstream: an HF repo id, "torchvision <model> <tag>", or an
# open_clip pretrained spec).
PLAN="$WORK/plan.tsv"
python - "$ONLY" > "$PLAN" <<'PY'
import sys
from atlaspatch_tpu.models.encoders.zoo import ENTRIES
only = sys.argv[1]
names = None if only == "all" else set(only.split(","))
for e in ENTRIES.values():
    if e.implemented and (names is None or e.name in names):
        print(f"{e.name}\t{e.source}")
PY

if [ "$DRY" = 1 ]; then
    echo "== would fetch (name -> upstream source) =="
    cat "$PLAN"
    echo "== then: verify-weights $ATLASPATCH_WEIGHTS_DIR =="
    echo "== then: drift_check snapshot $WORK/drift --names <fetched> =="
    exit 0
fi

command -v python >/dev/null
FETCH_LOG="$WORK/fetch.log"; : > "$FETCH_LOG"

# Fetch loop: HF repo ids go through huggingface_hub (resolves gated access
# via HF_TOKEN); torchvision sources go through torch.hub's checkpoint URLs.
FETCHED="$WORK/fetched.txt"; : > "$FETCHED"
while IFS=$'\t' read -r name source; do
    echo "--- $name  ($source)" | tee -a "$FETCH_LOG"
    if python - "$name" "$source" >> "$FETCH_LOG" 2>&1 <<'PY'
import os, sys
name, source = sys.argv[1], sys.argv[2]
dest = os.environ["ATLASPATCH_WEIGHTS_DIR"]
if source.startswith("torchvision "):
    # torchvision tags name the torch.hub checkpoint; hub caches + verifies.
    import torch, torchvision.models as tvm
    model_name = source.split()[1]
    weights = tvm.get_model_weights(model_name).DEFAULT
    sd = weights.get_state_dict(progress=False)
    torch.save(sd, os.path.join(dest, f"{name}.pth"))
elif source.startswith("open_clip "):
    import open_clip  # reference uses open_clip's own cache
    _, pretrained, model = source.split(None, 2)
    open_clip.create_model_and_transforms(model, pretrained=pretrained)
else:
    from huggingface_hub import snapshot_download
    repo = source.split()[0]
    snapshot_download(repo, token=os.environ.get("HF_TOKEN"))
PY
    then echo "$name" >> "$FETCHED"
    else echo "FETCH-FAIL $name" | tee -a "$FETCH_LOG"
    fi
done < "$PLAN"

# Preflight + drift snapshot over everything that landed.
python -m atlaspatch_tpu.cli verify-weights "$ATLASPATCH_WEIGHTS_DIR" \
    | tee "$WORK/verify.txt" || true
NAMES="$(paste -sd, "$FETCHED")"
python -m atlaspatch_tpu.tools.drift_check snapshot "$WORK/drift" \
    --names "$NAMES" | tee "$WORK/drift_snapshot.txt" || true

REPORT="$WORK/WEIGHTS_REPORT.md"
{
    echo "# Real-weight validation report ($(date -u +%F))"
    echo
    echo "Produced by tools/fetch_and_verify.sh; commit next to docs/WEIGHTS.md."
    echo
    echo '## verify-weights (converter -> shapes -> smoke -> hf-json)'
    echo '```'; cat "$WORK/verify.txt"; echo '```'
    echo
    echo '## Feature snapshots (drift_check)'
    echo '```'; cat "$WORK/drift_snapshot.txt"; echo '```'
    echo
    echo "## Next: reference-side features"
    echo "Embed \`$WORK/drift/patches.npy\` with the reference for each name,"
    echo "save as \`<name>.ref.npy\` in \`$WORK/drift\`, then:"
    echo
    echo "    python -m atlaspatch_tpu.tools.drift_check compare $WORK/drift"
    echo
    echo "PASS at max_rel < 1e-3 closes the BASELINE.json north-star."
} > "$REPORT"
echo "report: $REPORT"
