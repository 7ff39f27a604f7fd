#!/bin/bash
# Round-3 continuation queue: (1) conv backward-overhead microbench (the
# roadmap's "conv-transpose grad layouts" lever — measure before
# chasing), (2) SSL-ablation reproducibility runs at two fresh trainer
# seeds (the round-3 +4.4-Dice gap was a single seed; the dataset stays
# fixed, so each seed isolates training stochasticity), (3) bench.py
# confirmation + cache warm for the driver.
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

run 40 conv_grad 3600 python scripts/exp_conv_grad.py
run 41 ablation_seed2337 14400 python scripts/exp_ssl_ablation.py --seed 2337 --work /tmp/ablation_runs_s2337
run 42 ablation_seed3337 14400 python scripts/exp_ssl_ablation.py --seed 3337 --work /tmp/ablation_runs_s3337
run 43 bench 3600 python bench.py
echo "QUEUE6 DONE $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
