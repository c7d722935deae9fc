#!/bin/bash
# Produce the committed quality artifacts from a finished
# config/synthetic_conv training run (VERDICT r4 item 2):
#   * final-checkpoint val split (gt/renders PNG pairs + PSNR print)
#   * demo_interpolate fly-through (timed FPS + jpg frames + cv2 mp4)
#   * curated copies under artifacts/r4_quality/ (small enough to commit)
#
# ONE TPU process at a time — run only when nothing else owns the chip.
# Usage: bash scripts/make_quality_artifacts.sh [exp_dir]
set -uo pipefail
cd "$(dirname "$0")/.."

EXP=${1:-output/r4_quality/log}
CKPT="$EXP/model_tree_full.pth"
[ -f "$CKPT" ] || { echo "missing $CKPT"; exit 1; }

echo "=== val split (final checkpoint)"
python apps/train.py --cfg config/synthetic_conv/train.yml split val \
    exp "$EXP" ckptname "$CKPT" 2>&1 | grep -aE "scale|psnr|Average|fps" | tail -10

echo "=== demo_interpolate"
python apps/train.py --cfg config/synthetic_conv/train.yml split demo_interpolate \
    exp "$EXP" ckptname "$EXP/model_tree_full_wotrain.pth" 2>&1 \
    | grep -aE "Average time|fps|make_video" | tail -5

echo "=== curate artifacts/r4_quality"
ART=artifacts/r4_quality
mkdir -p "$ART"
# training-time gt|render side-by-sides (first/mid/last)
ls "$EXP"/vis/*.jpg >/dev/null 2>&1 && {
  first=$(ls "$EXP"/vis/*.jpg | head -1)
  last=$(ls "$EXP"/vis/*.jpg | tail -1)
  mid=$(ls "$EXP"/vis/*.jpg | awk 'NR==1{f=$0} {a[NR]=$0} END{print a[int(NR/2)+1]}')
  cp "$first" "$ART/vis_first_$(basename "$first")"
  cp "$mid" "$ART/vis_mid_$(basename "$mid")"
  cp "$last" "$ART/vis_final_$(basename "$last")"
}
# val gt|render pairs at final scale
for d in "$EXP"/test/scale_*/; do
  s=$(basename "$d")
  [ -f "$d/gt/0000.png" ] && cp "$d/gt/0000.png" "$ART/val_${s}_gt.png"
  [ -f "$d/renders/0000.png" ] && cp "$d/renders/0000.png" "$ART/val_${s}_render.png"
done
# demo video + a frame
demodir=$(ls -d "$EXP"/demo_interpolate* 2>/dev/null | head -1)
if [ -n "${demodir:-}" ]; then
  mp4=$(find "$demodir" -name "*.mp4" | head -1)
  [ -n "$mp4" ] && cp "$mp4" "$ART/demo_interpolate.mp4"
  fr=$(find "$demodir" -name "*.jpg" | head -1)
  [ -n "$fr" ] && cp "$fr" "$ART/demo_frame_000.jpg"
fi
# scalar curve
scal=$(find "$EXP" -name scalars.jsonl | head -1)
[ -n "$scal" ] && cp "$scal" "$ART/scalars.jsonl"
du -sh "$ART"
ls -la "$ART"
