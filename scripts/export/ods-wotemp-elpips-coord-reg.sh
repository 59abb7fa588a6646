#!/bin/bash
# StableHLO export of the CNN-only atlas interface (the reference's
# frozen-graph -> ONNX path, without the ONNX detour).
python export.py \
  --experiment_name ods-wotemp-elpips-coord \
  --coord_net true --net_only true "$@"
