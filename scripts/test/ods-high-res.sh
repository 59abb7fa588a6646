#!/bin/bash
# High-resolution shell-streamed re-render (after the regular pass has
# written blend_weights.npy / alphas.npy).
python test.py \
  --cameras_glob 'glob/test/regular/*.txt' \
  --image_dir test_640x320 --hres_image_dir test_4096x2048 \
  --experiment_name ods-wotemp-elpips-coord \
  --coord_net true --output_root ./test --test_type high_res_only "$@"
