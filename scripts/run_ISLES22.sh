#!/bin/bash
# DyCON-TPU training on ISLES-2022 (canonical config; reference run_ISLES22.sh)
python -m dycon_paper_replication_tpu.cli.train_isles22 \
  --root_dir "../data/ISLES22" \
  --exp "ISLES22" \
  --model "unet_3D" \
  --max_iterations 20000 \
  --temp 0.6 \
  --batch_size 2 \
  --labeled_bs 1 \
  --labelnum 10 \
  --patch_size 96 96 64
