#!/bin/bash
# Stylize a line drawing (mirrors reference neube_stylize.sh defaults:
# feature_blending_level=2, color_mode=1, crop_margin=10, --on_white).
set -e
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
CKPT="${1:?usage: neube_stylize.sh <gan_checkpoint> <geo_image> <outdir> [flags]}"
GEO="${2:?need geometry image}"
OUT="${3:?need output dir}"
shift 3
python "$SCRIPT_DIR/scripts/paint_image_main.py" \
  --gan_checkpoint="$CKPT" --geo_image="$GEO" --output_dir="$OUT" \
  --feature_blending_level=2 --color_mode=1 --crop_margin=10 --on_white "$@"
