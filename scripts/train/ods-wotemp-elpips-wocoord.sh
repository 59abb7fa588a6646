#!/bin/bash
# ODS training without CoordNet (wrap-pad 360 U-Net).
python train.py \
  --cameras_glob 'glob/train/ods/*.txt' \
  --image_dir train_640x320 \
  --experiment_name ods-wotemp-elpips-wocoord \
  --which_loss elpips \
  --elpips_weight_path elpips_vgg.npz \
  --max_steps 140000 "$@"
