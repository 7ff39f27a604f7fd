#!/bin/bash
# Serial TPU work queue for round 3 — one process at a time, a liveness
# probe between phases (the relay wedges if a TPU process is killed
# mid-compile; see CLAUDE.md). Logs to /tmp/tpuq/NN_name.log.
#
# Ordered by value-per-TPU-minute: the conv microbenches decide whether
# the Pallas kernel becomes the inference/training conv (cheap, gates
# further perf work), then the SSL ablation (the round's key quality
# evidence), then VNet perf rows / step profile / ckpt stall.
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

run 01 conv_xla      2400 python scripts/exp_conv_mxu.py conv
run 02 conv_pallas   2400 python scripts/exp_conv_mxu2.py conv_pallas
run 03 conv_shift    2400 python scripts/exp_conv_mxu2.py conv_shift
run 04 gemm8x        2400 python scripts/exp_conv_mxu.py gemm8x
run 05 ssl_ablation  9000 python scripts/exp_ssl_ablation.py --iters 2500 --labelnum 3
run 06 vnet_ncdhw    2400 python scripts/bench_train.py --configs pancreas --model vnet --layout NCDHW
run 07 vnet_folded   2400 python scripts/bench_train.py --configs pancreas --model vnet --layout folded
run 08 step_profile  2400 python scripts/exp_step_profile.py --dataset pancreas
run 09 ckpt_stall    1800 python scripts/exp_ckpt_stall.py
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
