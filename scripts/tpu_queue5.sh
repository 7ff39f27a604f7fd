#!/bin/bash
# Fifth-phase round-3 TPU queue: folded VNet at remat=none (the one
# remat=none cell not yet measured), now that layout=auto resolves to
# folded for vnet.
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

run 30 vnet_folded_remat_none 2400 python scripts/bench_train.py --configs pancreas --model vnet --remat none --layout folded
echo "QUEUE5 DONE $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
