#!/bin/bash
# Round-3 continuation queue #2: SSL-ablation reproducibility runs at two
# fresh trainer seeds (the round-3 +4.4-Dice DyCON-over-supervised gap
# was a single seed; the hard dataset stays fixed, so each seed isolates
# training stochasticity). One TPU process at a time; probe-before-run.
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

run 60 ablation_seed2337 14400 python scripts/exp_ssl_ablation.py --seed 2337 --work /tmp/ablation_runs_s2337
run 61 ablation_seed3337 14400 python scripts/exp_ssl_ablation.py --seed 3337 --work /tmp/ablation_runs_s3337
echo "QUEUE8 DONE $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
