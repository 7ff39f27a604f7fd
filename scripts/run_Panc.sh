#!/bin/bash
# DyCON-TPU training on Pancreas-CT (canonical config; reference run_Panc.sh)
python -m dycon_paper_replication_tpu.cli.train_pancreas \
  --root_dir "../data/Pancreas" \
  --exp "PancreasCT" \
  --model "unet_3D" \
  --max_iterations 20000 \
  --temp 0.6 \
  --batch_size 8 \
  --labelnum 12
