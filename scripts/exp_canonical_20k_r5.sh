#!/bin/bash
# Round-5 continuation of the canonical 20k Pancreas run (VERDICT r4
# missing #1): resume the surviving round-4 tree (iter 4132, clean
# internal-budget exit) with `--resume auto` and drive it to 20,000
# iterations, then run the reference's dense offline test protocol
# (test_Pancreas.py:58-72 analogue) on the best checkpoint.
#
# Same relay discipline as exp_canonical_20k.sh: internal
# --time_budget_s clean exits only, one TPU process, artifacts copied
# into bench_results/ regardless of how far training gets.
#
# Usage: exp_canonical_20k_r5.sh <deadline_epoch_s>
#   deadline = wall time by which the TPU must be FREE.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"

DEADLINE="${1:?usage: exp_canonical_20k_r5.sh <deadline_epoch_s>}"
WORK=/tmp/canon20k
DATA="$WORK/Pancreas"
RUNS="$WORK/runs"
mkdir -p "$WORK" bench_results
LOG="$WORK/orchestrator_r5.log"
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

FLAGS=(--root_dir "$DATA" --snapshot_root "$RUNS"
       --max_iterations 20000 --save_every 1000
       --compute_dtype bfloat16
       --fetch_ahead 1 --step_diagnostics cadence)

if [ ! -e "$DATA/train.list" ]; then
  say "round-4 canonical tree missing — regenerating (62/20 at 128,128,112)"
  python -c "
from dycon_paper_replication_tpu.data.synthetic import make_pancreas
make_pancreas('$DATA', n_train=62, n_test=20, shape=(128,128,112))
" >>"$LOG" 2>&1 || { say "datagen FAILED"; exit 1; }
fi

# leg 3: resume to 20k. Keep 2100 s for the dense eval + copies.
if [ ! -e "$WORK/leg3.done" ]; then
  now=$(date +%s)
  budget=$(( DEADLINE - now - 2100 ))
  if [ "$budget" -lt 300 ]; then say "no budget for leg3 ($budget s)"; exit 2; fi
  say "leg3: --resume auto from round-4 tree, time_budget_s=$budget"
  python -u -m dycon_paper_replication_tpu.cli.train_pancreas \
    "${FLAGS[@]}" --resume auto --time_budget_s "$budget" \
    >"$WORK/leg3.log" 2>&1
  rc=$?
  say "leg3 rc=$rc"
  [ $rc -eq 0 ] && touch "$WORK/leg3.done"
fi

RUN_DIR=$(ls -d "$RUNS"/PancreasCT/*max_iterations20000* 2>/dev/null | head -1)
if [ -n "${RUN_DIR:-}" ]; then
  cp "$RUN_DIR/metrics.jsonl" bench_results/r05_canonical20k_metrics.jsonl 2>/dev/null
  say "metrics.jsonl copied ($(wc -l <bench_results/r05_canonical20k_metrics.jsonl) lines)"
fi

last_it=$(grep -oE 'Iteration [0-9]+ :' "$WORK/leg3.log" 2>/dev/null | tail -1 | grep -oE '[0-9]+' || echo 0)
now=$(date +%s)
if [ "${last_it:-0}" -ge 20000 ] && [ $(( DEADLINE - now )) -ge 1500 ]; then
  say "dense test eval on best checkpoint (canonical stride 16/4, patch 96^3... reference strides)"
  python -u -m dycon_paper_replication_tpu.cli.test_pancreas \
    --root_path "$DATA" --snapshot_root "$RUNS" --max_iterations 20000 \
    >"$WORK/test_eval_r5.log" 2>&1
  say "test eval rc=$? (tail below)"
  tail -8 "$WORK/test_eval_r5.log" | tee -a "$LOG"
  cp "$WORK/test_eval_r5.log" bench_results/r05_canonical20k_test_eval.log 2>/dev/null
fi
cp "$LOG" bench_results/r05_canonical20k_orchestrator.log 2>/dev/null
say "CANONICAL-20K-R5 ORCHESTRATOR DONE"
