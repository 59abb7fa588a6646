#!/bin/bash
# Replica perspective (MPI / plane-sweep) training.
python train.py \
  --input_type PP \
  --cameras_glob 'glob/train/pp/*.txt' \
  --image_dir train_pp \
  --experiment_name pp-wotemp-elpips-coord \
  --which_loss elpips --coord_net true \
  --elpips_weight_path elpips_vgg.npz \
  --max_steps 140000 "$@"
