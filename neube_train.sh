#!/bin/bash
# Train (or finetune) the brushstroke GAN.
# Usage: ./neube_train.sh <train|finetune> <style_data> <geom_data> <outdir> [extra flags...]
# Mirrors the reference neube_train.sh flag-bundle assembly.
set -e
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"

MODE="${1:?usage: neube_train.sh <train|finetune> <style_data> <geom_data> <outdir> [flags]}"
STYLE_DATA="${2:?need style data path}"
GEOM_DATA="${3:?need geometry data path}"
OUTDIR="${4:?need output dir}"
shift 4

FLAGS=$(grep -v '^#' "$SCRIPT_DIR/train_flags.txt" | tr '\n' ' ')
if [ "$MODE" == "finetune" ]; then
  FLAGS="$FLAGS $(grep -v '^#' "$SCRIPT_DIR/finetune_flags.txt" | tr '\n' ' ')"
fi

mkdir -p "$OUTDIR"
LOG="$OUTDIR/train_$(date +%Y%m%d_%H%M%S).log"
python "$SCRIPT_DIR/scripts/train_main.py" \
  --data="$STYLE_DATA" --geom_data="$GEOM_DATA" --outdir="$OUTDIR" \
  $FLAGS "$@" 2>&1 | tee "$LOG"
