#!/bin/bash
# Fourth-phase round-3 TPU queue: remat=none follow-ups (queue3's copies
# crashed on a double-remat kwarg / labelnum<labeled_bs), plus the final
# bench with the sweep-winning (patch_batch 8, group 8).
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

run 27 vnet_remat_none 2400 python scripts/bench_train.py --configs pancreas --model vnet --remat none
run 28 isles_remat_none 2400 python scripts/bench_train.py --configs isles22 --remat none

# memory confirmation: the REAL trainer (loader + grouped val program +
# async ckpt resident alongside the step) at canonical geometry with
# remat=none — the bare-step profile alone does not prove headroom
python - <<'EOF'
from dycon_paper_replication_tpu.data.synthetic import make_pancreas
import os
if not os.path.exists("/tmp/canon_pancreas/train.list"):
    make_pancreas("/tmp/canon_pancreas", n_train=6, n_test=2, shape=(128, 128, 112))
EOF
run 29 trainer_remat_none 2400 python -m dycon_paper_replication_tpu.cli.train_pancreas \
  --root_dir /tmp/canon_pancreas --snapshot_root /tmp/canon_remat_none \
  --labelnum 4 --batch_size 8 --labeled_bs 4 --patch_size 112 112 96 \
  --remat none --max_iterations 30 --val_every 15
echo "QUEUE4 DONE $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
