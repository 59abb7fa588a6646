#!/bin/bash
# ODS training with transform-inverse (temporal-consistency) regularization.
python train.py \
  --cameras_glob 'glob/train/ods/*.txt' \
  --image_dir train_640x320 \
  --experiment_name ods-temp-elpips-coord \
  --which_loss elpips --coord_net true --transform_inverse_reg true \
  --elpips_weight_path elpips_vgg.npz \
  --max_steps 140000 "$@"
