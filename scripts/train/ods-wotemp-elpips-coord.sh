#!/bin/bash
# Canonical ODS training: E-LPIPS loss + CoordNet, no transform-inverse reg
# (mirrors the reference's scripts/train/ods-wotemp-elpips-coord.sh).
python train.py \
  --cameras_glob 'glob/train/ods/*.txt' \
  --image_dir train_640x320 \
  --experiment_name ods-wotemp-elpips-coord \
  --which_loss elpips --coord_net true \
  --elpips_weight_path elpips_vgg.npz \
  --max_steps 140000 "$@"
