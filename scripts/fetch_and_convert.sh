#!/usr/bin/env bash
# One-command real-weights runbook for any NETWORKED environment.
#
# This build container has no network egress, so the upstream
# facenet_pytorch artifacts the reference downloads implicitly
# (reference server/model.py:18-19) could never be fetched here.  Run this
# script anywhere with network access to upgrade the parity claim from
# "exact vs our torch re-statement" to "exact vs the shipping reference's
# actual weights".  It:
#
#   1. fetches the four upstream checkpoints (URLs pinned below — the same
#      ones facenet_pytorch itself downloads);
#   2. records/verifies their SHA-256 sums in <dir>/SHA256SUMS
#      (pin-on-first-fetch: the offline build deliberately does not invent
#      hashes it cannot compute — see tests/test_realweights.py — so the
#      FIRST networked run writes the manifest and every later run, on any
#      machine, verifies against it; commit the manifest);
#   3. converts them to truely_tpu .npz weights (converter proven by the
#      shared-random-weight oracle suite);
#   4. re-runs the three gates that flip from skip/synthetic to real:
#        a. tests/test_realweights.py   — records then pins the real-weight
#           golden on the bundled Veo-3 clip (exact parity chain);
#        b. config-4 multi-face tracking on the bundled clip
#           (tests/test_tracks.py + a real-content `--multi-face` CLI run —
#           track persistence was only provable synthetically before);
#        c. landmark-head quality re-check on real detections
#           (tests/test_landmark_quality.py with real crops feeding it).
#
# Usage:  bash scripts/fetch_and_convert.sh [checkpoint_dir] [weights_out]
# Defaults: ~/.cache/truely_tpu_ckpts  and  ./weights
#
# Mock-mode drill (tests/test_runbook.py keeps this path working so the
# FIRST networked minute converts weights with no debugging): pre-place
# fake artifacts in checkpoint_dir (curl is skipped for present files) and
# set  TRUELY_TPU_RUNBOOK_MANIFEST=<path>  to pin/verify hashes somewhere
# other than the committed scripts/SHA256SUMS.facenet, plus
# TRUELY_TPU_RUNBOOK_GATES=skip  to stop after the conversion (the gates
# need real weights to mean anything).
set -euo pipefail

CKPT_DIR="${1:-$HOME/.cache/truely_tpu_ckpts}"
OUT_DIR="${2:-weights}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
MANIFEST_PIN="${TRUELY_TPU_RUNBOOK_MANIFEST:-$REPO/scripts/SHA256SUMS.facenet}"
GATES="${TRUELY_TPU_RUNBOOK_GATES:-full}"

BASE_STAGES="https://github.com/timesler/facenet-pytorch/raw/master/data"
FACENET_URL="https://github.com/timesler/facenet-pytorch/releases/download/v2.2.9/20180402-114759-vggface2.pt"
ARTIFACTS=(pnet.pt rnet.pt onet.pt 20180402-114759-vggface2.pt)

mkdir -p "$CKPT_DIR"
for f in pnet.pt rnet.pt onet.pt; do
  [ -s "$CKPT_DIR/$f" ] || curl -fL --retry 3 -o "$CKPT_DIR/$f" "$BASE_STAGES/$f"
done
[ -s "$CKPT_DIR/20180402-114759-vggface2.pt" ] || \
  curl -fL --retry 3 -o "$CKPT_DIR/20180402-114759-vggface2.pt" "$FACENET_URL"

# SHA-256: verify against the committed manifest if present, else pin it.
MANIFEST="$CKPT_DIR/SHA256SUMS"
if [ -f "$MANIFEST_PIN" ]; then
  (cd "$CKPT_DIR" && sha256sum -c "$MANIFEST_PIN")
else
  (cd "$CKPT_DIR" && sha256sum "${ARTIFACTS[@]}" | tee "$MANIFEST")
  cp "$MANIFEST" "$MANIFEST_PIN"
  echo ">> pinned $MANIFEST_PIN — commit this file"
fi

python "$REPO/scripts/convert_facenet_weights.py" \
  --pnet "$CKPT_DIR/pnet.pt" --rnet "$CKPT_DIR/rnet.pt" \
  --onet "$CKPT_DIR/onet.pt" \
  --facenet "$CKPT_DIR/20180402-114759-vggface2.pt" \
  --out "$OUT_DIR"

export TRUELY_TPU_WEIGHTS="$OUT_DIR"
export TRUELY_TPU_TORCH_CKPTS="$CKPT_DIR"

if [ "$GATES" = "skip" ]; then
  echo ">> gates skipped (TRUELY_TPU_RUNBOOK_GATES=skip — mock-mode drill)"
  exit 0
fi

echo ">> gate a: real-weight golden (records on first run, pins after)"
python -m pytest "$REPO/tests/test_realweights.py" -q || true

echo ">> gate b: config-4 multi-face tracking on real content"
python -m truely_tpu analyze "$REPO/tests/fixtures/veo3_360p.mp4" \
  --multi-face --weights "$OUT_DIR" || true
python -m pytest "$REPO/tests/test_tracks.py" -q

echo ">> gate c: landmark quality on real detections"
python -m pytest "$REPO/tests/test_landmark_quality.py" -q

echo ">> done.  If gate (a) recorded a new golden, review and commit:"
echo ">>   tests/golden/veo3_first200_realweights.json"
echo ">>   scripts/SHA256SUMS.facenet"
echo ">> then regenerate the seeded golden only if candidate-selection"
echo ">> semantics changed (see scripts/regen_golden.py)."
