#!/bin/bash
# Regular test-set inference: renders + per-shell dumps.
python test.py \
  --cameras_glob 'glob/test/regular/*.txt' \
  --image_dir test_640x320 \
  --experiment_name ods-wotemp-elpips-coord \
  --coord_net true --output_root ./test "$@"
