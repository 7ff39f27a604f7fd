#!/bin/bash
# Second-phase round-3 TPU queue: grouped sliding-window measurements
# (run AFTER tpu_queue.sh finishes — one TPU process at a time).
# bench (item 11 of queue 1) already measures the grouped default; this
# sweep separates batch shape from chunk-padding waste.
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

run 12 sweep_8_1   2400 python scripts/exp_group_sweep.py 8,1
run 13 sweep_8_8   2400 python scripts/exp_group_sweep.py 8,8
run 14 sweep_16_16 2400 python scripts/exp_group_sweep.py 16,16
run 15 sweep_8_4   2400 python scripts/exp_group_sweep.py 8,4
run 16 ablation_test 2400 python scripts/exp_ssl_ablation.py --test_only
run 17 remat_none  2400 python scripts/exp_step_profile.py --remat none --rows full_step
run 18 remat_none_brats 2400 python scripts/exp_step_profile.py --dataset brats19 --remat none --rows full_step
run 19 bench       2400 python bench.py
echo "QUEUE2 DONE $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
