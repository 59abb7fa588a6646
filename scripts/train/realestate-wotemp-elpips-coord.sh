#!/bin/bash
# RealEstate10K (perspective MPI) training.
python train.py \
  --input_type REALESTATE_PP \
  --cameras_glob 'realestate/train/*.txt' \
  --image_dir realestate/images \
  --experiment_name realestate-wotemp-elpips-coord \
  --which_loss elpips --coord_net true \
  --elpips_weight_path elpips_vgg.npz \
  --max_steps 140000 "$@"
