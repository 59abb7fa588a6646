#!/bin/bash
# SSIM / PSNR (+ E-LPIPS with --with_elpips) tables over test outputs.
python eval.py --result_root ./test/ods-wotemp-elpips-coord "$@"
