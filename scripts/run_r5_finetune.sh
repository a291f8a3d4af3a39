#!/bin/bash
# Round-5 stage 2: clarity finetune of the r5 flagship snapshot.
#
# Two variants:
#   faithful — exactly reference finetune_flags.txt (clarity anchors only).
#   color    — finetune_flags.txt + 1.0*iou(u): the color-control fix from
#              docs/evidence/r5_color_diag (the stroke interior's uvs mass
#              drifts into the secondary V channel once the main phase's
#              only geom anchor is iou_inv(uvs); iou(u) — the reference's
#              own warmstart term, losses.py:453-461 — pulls it back into
#              the user-overridable U channel).
#
# Usage: run_r5_finetune.sh SNAPSHOT {faithful|color} [KIMG]
set -ex
cd "$(dirname "$0")/.."

SNAP="$1"
VARIANT="${2:-color}"
KIMG="${3:-200}"

LOSSES='0.5*iou_inv(uvs)+0.5*lpips(fake_orig)+0.5*l1(fake_orig)'
if [ "$VARIANT" == "color" ]; then
  LOSSES="${LOSSES}+1.0*iou(u)"
fi

exec python scripts/train_main.py \
  --data _data/style.zip --geom_data _data/geom.zip \
  --encoder_checkpt _data/ae/ae_latest.pkl \
  --outdir "runs/r5_finetune_${VARIANT}" \
  --resume "$SNAP" \
  --output_resolution 128 --zdim 64 --wdim 64 --channel_max 128 \
  --color_format triad --batch 64 --d_arch orig --synthesis_arch orig \
  --glr 0.0002 --dlr 0.0002 \
  --geom_inject_resolutions 0,1 \
  --geom_warmstart_losses "$LOSSES" \
  --geom_warmstart_mode last_and_rgb \
  --geom_warmstart_kimg "$KIMG" --exit_after_warmstart \
  --kimg "$KIMG" --snap 10 --image_snap 10 \
  --fused --device_dataset --steps_per_dispatch 16 \
  --seed 0 --metrics fid,forger
