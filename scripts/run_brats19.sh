#!/bin/bash
# DyCON-TPU training on BraTS-2019 (canonical config; reference run_brats19.sh)
python -m dycon_paper_replication_tpu.cli.train_brats19 \
  --root_dir "../data/BraTS2019" \
  --exp "BraTS2019" \
  --model "unet_3D" \
  --max_iterations 20000 \
  --temp 0.6 \
  --batch_size 8 \
  --labelnum 25
