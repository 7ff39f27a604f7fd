#!/bin/bash
# Serial TPU work queue for round 3 — one process at a time, a liveness
# probe between phases (the relay wedges if a TPU process is killed
# mid-compile; see CLAUDE.md). Logs to /tmp/tpuq/NN_name.log.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=.jax_cache
mkdir -p /tmp/tpuq

# Patient probe: killing a client mid-claim appears to leave a fresh
# stale claim (self-perpetuating wedge — see CLAUDE.md), so give the
# claim 15 min before declaring the relay wedged.
probe() {
  timeout 900 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
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
run 02 gemm8x        2400 python scripts/exp_conv_mxu.py gemm8x
run 03 gemm1024      2400 python scripts/exp_conv_mxu.py gemm1024
run 04 conv_shift    2400 python scripts/exp_conv_mxu2.py conv_shift
run 05 conv_pallas   2400 python scripts/exp_conv_mxu2.py conv_pallas
run 06 vnet_ncdhw    2400 python scripts/bench_train.py --configs pancreas --model vnet --layout NCDHW
run 07 vnet_folded   2400 python scripts/bench_train.py --configs pancreas --model vnet --layout folded
run 08 ckpt_stall    1800 python scripts/exp_ckpt_stall.py
run 09 step_profile  2400 python scripts/exp_step_profile.py --dataset pancreas
run 10 ssl_ablation  9000 python scripts/exp_ssl_ablation.py --iters 2500 --labelnum 3
echo "QUEUE DONE $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
