#!/bin/bash
# Round-5 stage 3: the complete brush-creation workflow against a TRAINED
# model (VERDICT task 6; reference anchor neube_run.sh:86-103):
#   1. project real media patches into the trained style space
#      (project_main -> ALL_projected_*.pkl, reference project_main.py:606-616)
#   2. clarity-optimize the projected library
#      (opt_clarity_main -> OPT_*.pkl, reference opt_clarity_main.py:258-266)
#   3. CLIP-index the brush space and run a text query
#   4. serve every library together (seed styles + projected + OPT + CLIP)
#      and paint with a projected brush over the websocket
#      (scripts/drive_brush_server.py writes the served-strokes evidence)
#
# Usage: run_r5_brush_workflow.sh SNAPSHOT OUT_DIR [N_MEDIA]
set -ex
cd "$(dirname "$0")/.."

SNAP="$1"
OUT="${2:-docs/evidence/r5_brush_workflow}"
N="${3:-8}"

mkdir -p "$OUT"

# 1) Pick N media patches (fresh seed => NOT in the training set: these are
# "novel media" targets, the reference's projected_novel_styles case).
python scripts/make_synthetic_media.py --output_dir /tmp/r5_brush_media \
    --num_images "$N" --resolution 128 --seed 777

TARGETS=$(ls /tmp/r5_brush_media/*.png | head -n "$N")

python scripts/project_main.py \
    --gan_checkpoint "$SNAP" \
    --target_image $TARGETS \
    --output_dir "$OUT/proj" \
    --num_steps 200 --num_patches 2 \
    --library_name ALL_projected_media.pkl --seed 0

python scripts/opt_clarity_main.py \
    --gan_checkpoint "$SNAP" \
    --library "$OUT/proj/ALL_projected_media.pkl" \
    --output_dir "$OUT/opt" --num_steps 120 --seed 0

python scripts/clip_search_main.py \
    --gan_checkpoint "$SNAP" \
    --library "$OUT/proj/ALL_projected_media.pkl" \
    --query "a dark ink brush stroke" --top_k 3 \
    --output_dir "$OUT/clip"

OPT_PKL=$(ls "$OUT"/opt/OPT_*.pkl | head -1)
# Curated seed library (the reference serves seed-txt libraries the same
# way, forger/ui/library.py:48-64 grammar: one integer seed per line).
printf '3\n7\n11\n21\n42\n' > "$OUT/seeds.txt"
LIBS="Seeds:disp:$OUT/seeds.txt"
LIBS="$LIBS,Projected_Media:disp:$OUT/proj/ALL_projected_media.pkl"
LIBS="$LIBS,Opt_Clarity:disp:$OPT_PKL"

python scripts/drive_brush_server.py \
    --gan_checkpoint "$SNAP" --libraries "$LIBS" \
    --out_dir "$OUT/served" --port 8741

echo "brush workflow complete: $OUT"
