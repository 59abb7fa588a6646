#!/bin/bash
# Temporal-consistency diffs over consecutive video frames.
python eval.py --result_root ./test/ods-wotemp-elpips-coord \
  --eval_type video "$@"
