#!/bin/bash
# Round-5 flagship workflow: deterministic data prep (identical seeds to the
# r4 run), AE pretrain, then a CONTINUOUS 3000-kimg train_flags.txt run
# (reference kimg=10000 flagship semantics at the 3000-kimg budget VERDICT
# task 5 prescribes), snap 50 so snapshot/metric overhead stays <5% of wall.
set -ex
cd "$(dirname "$0")/.."

mkdir -p _data

if [ ! -f _data/style.zip ]; then
  python scripts/make_synthetic_media.py --output_dir /tmp/r5_media \
      --num_images 4000 --resolution 128 --seed 0
  python scripts/dataset_tool.py --source /tmp/r5_media \
      --dest _data/style.zip --resolution 128
fi

if [ ! -f _data/geom.zip ]; then
  python scripts/create_splines.py --output_dir /tmp/r5_splines \
      --num_images 1000 --width 192 --seed 0
  python scripts/prep_geom_data.py --input_dir /tmp/r5_splines \
      --output_dir /tmp/r5_triband
  python scripts/dataset_tool.py --source /tmp/r5_triband \
      --dest _data/geom.zip --resolution 192
fi

if [ ! -f _data/ae/ae_latest.pkl ]; then
  python scripts/train_stroke_autoencoder.py --data _data/geom.zip \
      --run_dir _data/ae --num_steps 10000 --widths 128 --seed 0
fi

exec python scripts/train_main.py \
  --data _data/style.zip --geom_data _data/geom.zip \
  --encoder_checkpt _data/ae/ae_latest.pkl \
  --outdir runs/r5 \
  --output_resolution 128 --zdim 64 --wdim 64 --channel_max 128 \
  --color_format triad --batch 64 --d_arch orig --synthesis_arch orig \
  --glr 0.0002 --dlr 0.0002 \
  --geom_inject_resolutions 0,1 \
  --geom_warmstart_kimg 50 --geom_warmstart_mode last_and_rgb \
  --geom_warmstart_losses '1.0*iou_inv(uvs)+1.0*iou(u)' \
  --geom_phase_losses '1.0*iou_inv(uvs)' --geom_phase_mode last_and_rgb \
  --geom_interval 200 \
  --kimg 3000 --snap 50 --image_snap 25 \
  --fused --device_dataset --steps_per_dispatch 16 \
  --seed 0 --metrics fid,forger
