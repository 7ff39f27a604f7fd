#!/bin/bash
# Third-phase round-3 TPU queue: the (patch_batch, group) sweep re-run
# (queue2's copies crashed on a missing sys.path bootstrap before
# touching the device) — one benchmark per process, probe before each.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=.jax_cache
mkdir -p /tmp/tpuq

probe() {
  timeout 2400 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

run() { # run NN name timeout cmd...
  local nn="$1" name="$2" to="$3"; shift 3
  echo "=== $nn $name ($(date +%H:%M:%S)) ===" | tee -a /tmp/tpuq/queue.log
  if ! probe; then
    echo "PROBE FAILED before $name — relay wedged, aborting queue" | tee -a /tmp/tpuq/queue.log
    exit 9
  fi
  timeout "$to" "$@" >"/tmp/tpuq/${nn}_${name}.log" 2>&1
  echo "  -> rc=$? ($(date +%H:%M:%S))" | tee -a /tmp/tpuq/queue.log
}

run 20 sweep_8_1   2400 python scripts/exp_group_sweep.py 8,1
run 21 sweep_8_8   2400 python scripts/exp_group_sweep.py 8,8
run 22 sweep_16_16 2400 python scripts/exp_group_sweep.py 16,16
run 23 sweep_8_4   2400 python scripts/exp_group_sweep.py 8,4

# remat=none at the other production configs (unet pancreas measured
# 416.3 vs 498.9 full — see 17_remat_none.log)
run 24 vnet_remat_none 2400 python scripts/bench_train.py --configs pancreas --model vnet --remat none
run 25 isles_remat_none 2400 python scripts/bench_train.py --configs isles22 --remat none

# memory confirmation: the REAL trainer (loader + val program + async
# ckpt resident alongside the step) at canonical geometry with
# remat=none — the profile above only ran the bare step
python - <<'EOF'
from dycon_paper_replication_tpu.data.synthetic import make_pancreas
import os
if not os.path.exists("/tmp/canon_pancreas/train.list"):
    make_pancreas("/tmp/canon_pancreas", n_train=6, n_test=2, shape=(128, 128, 112))
EOF
run 26 trainer_remat_none 2400 python -m dycon_paper_replication_tpu.cli.train_pancreas \
  --root_dir /tmp/canon_pancreas --snapshot_root /tmp/canon_remat_none \
  --labelnum 3 --batch_size 8 --labeled_bs 4 --patch_size 112 112 96 \
  --remat none --max_iterations 30 --val_every 15
echo "QUEUE3 DONE $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
