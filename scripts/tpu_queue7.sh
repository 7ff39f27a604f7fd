#!/bin/bash
# Round-3 continuation queue (fresh VM: .jax_cache is empty, so every
# program cold-compiles through the relay). Order is by value-per-minute
# for a ~1 h session:
#   (1) bench.py — confirms the 1.9 vols/sec pipeline on this VM AND
#       warms the exact programs the round driver re-runs at end of
#       round (bench.py now sets JAX_COMPILATION_CACHE_DIR itself);
#   (2) conv-grad microbench — decides the round-4 "conv-transpose grad
#       layouts" lever (measure before chasing);
#   (3) one SSL-ablation reproducibility seed — the round-3 +4.4-Dice
#       gap was a single seed; partial completion still warms caches.
#
# One TPU process at a time; probe-before-run per the wedge protocol.
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

run 50 bench 3600 python bench.py
run 51 conv_grad 3600 python scripts/exp_conv_grad.py
run 52 ablation_seed2337 14400 python scripts/exp_ssl_ablation.py --seed 2337 --work /tmp/ablation_runs_s2337
echo "QUEUE7 DONE $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
