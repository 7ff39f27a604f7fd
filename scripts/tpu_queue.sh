#!/bin/bash
# Serial TPU work queue for round 3 — one process at a time, a liveness
# probe between phases (the relay wedges if a TPU process is killed
# mid-compile; see CLAUDE.md). Logs to /tmp/tpuq/NN_name.log.
#
# The conv microbenches from the first half of round 3 are done
# (BASELINE.md "conv formulation study"). What remains, ordered by
# value-per-TPU-minute with the round's key quality evidence first:
# the SSL ablation (DyCON vs supervised on the hard task), VNet perf
# rows + e2e quality drive, the step-cost decomposition, and the
# checkpoint-stall measurement.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=.jax_cache
mkdir -p /tmp/tpuq

# Patient probe: killing a client mid-claim appears to leave a fresh
# stale claim (self-perpetuating wedge — see CLAUDE.md). A wedged claim
# returns UNAVAILABLE on its own after ~25 min, so give it 40 min and
# never kill it early.
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

run 05 ssl_ablation  12000 python scripts/exp_ssl_ablation.py --iters 2500 --labelnum 3
run 06 vnet_ncdhw    2400 python scripts/bench_train.py --configs pancreas --model vnet --layout NCDHW
run 07 vnet_folded   2400 python scripts/bench_train.py --configs pancreas --model vnet --layout folded
run 08 vnet_e2e      6000 python scripts/exp_vnet_e2e.py --iters 1000
run 09 step_profile  2400 python scripts/exp_step_profile.py --dataset pancreas
run 10 ckpt_stall    1800 python scripts/exp_ckpt_stall.py
run 11 bench         1800 python bench.py
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
