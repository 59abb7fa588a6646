#!/bin/bash
# Video-sequence inference (consecutive frames for temporal eval).
python test.py \
  --cameras_glob 'glob/test/video/*.txt' \
  --image_dir test_video_640x320 \
  --experiment_name ods-wotemp-elpips-coord \
  --coord_net true --output_root ./test --test_type on_video "$@"
