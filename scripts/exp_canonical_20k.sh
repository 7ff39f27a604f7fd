#!/bin/bash
# Canonical 20k-iteration Pancreas run (VERDICT r3 #3): synthetic
# canonical geometry (62 train / 20 test at (128,128,112)), labelnum 12,
# bs 8 (4 labeled), patch (112,112,96) — the exact reference protocol
# (run_Panc.sh) — with a DELIBERATE mid-run SIGKILL at ~iter 1200 and a
# `--resume auto` second leg (latest-checkpoint semantics), then a final
# dense test eval if time permits.
#
# Everything is bounded by INTERNAL --time_budget_s clean exits, never
# an external `timeout` kill (the documented relay-wedge trigger,
# CLAUDE.md). The one SIGKILL is scheduled well past all compiles
# (first val at iter 200 compiles the last program) and right after a
# periodic save (save_every 1000), while the relay is in steady state.
#
# Usage: exp_canonical_20k.sh <deadline_epoch_s>
#   deadline = wall time by which the TPU must be FREE (driver reserve).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"

DEADLINE="${1:?usage: exp_canonical_20k.sh <deadline_epoch_s>}"
WORK=/tmp/canon20k
DATA="$WORK/Pancreas"
RUNS="$WORK/runs"
mkdir -p "$WORK" bench_results
LOG="$WORK/orchestrator.log"
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

KILL_AT=1200          # iteration for the deliberate SIGKILL (leg 1)
FLAGS=(--root_dir "$DATA" --snapshot_root "$RUNS"
       --max_iterations 20000 --save_every 1000
       --compute_dtype bfloat16   # the production TPU default (BASELINE.md 416 ms/step)
       # host-loop levers, proven bit-identical to the sync loop
       # (tests/test_train.py) and measured -7.6% wall / -14% device
       # step on this chip (bench_results/r04_trainer_wall.json)
       --fetch_ahead 1 --step_diagnostics cadence)

# 0: dataset (host-only, ~1 min)
if [ ! -e "$DATA/train.list" ]; then
  say "generating synthetic canonical Pancreas tree (62 train / 20 test)"
  python -c "
from dycon_paper_replication_tpu.data.synthetic import make_pancreas
make_pancreas('$DATA', n_train=62, n_test=20, shape=(128,128,112))
" >>"$LOG" 2>&1 || { say "datagen FAILED"; exit 1; }
fi

# 1: leg 1 — fresh run, killed in anger at iter $KILL_AT
if [ ! -e "$WORK/leg1.done" ]; then
  say "leg1: fresh run, SIGKILL scheduled at iter >= $KILL_AT"
  python -u -m dycon_paper_replication_tpu.cli.train_pancreas \
    "${FLAGS[@]}" --time_budget_s 5400 >"$WORK/leg1.log" 2>&1 &
  PID=$!
  echo "$PID" >"$WORK/leg1.pid"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 20
    it=$(grep -oE 'Iteration [0-9]+ :' "$WORK/leg1.log" | tail -1 | grep -oE '[0-9]+' || echo 0)
    if [ "${it:-0}" -ge "$KILL_AT" ]; then
      say "leg1 reached iteration $it — SIGKILL $PID (deliberate mid-run kill)"
      kill -9 "$PID"
      break
    fi
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      say "deadline before kill point; leg1 time budget will stop it"
      break
    fi
  done
  wait "$PID" 2>/dev/null
  say "leg1 ended (last logged iteration: ${it:-?})"
  touch "$WORK/leg1.done"
  sleep 60   # let the relay settle before the next claim
fi

# 2: leg 2 — resume auto (latest ckpt), budget = time to deadline
if [ ! -e "$WORK/leg2.done" ]; then
  now=$(date +%s)
  # keep 35 min for the dense test eval + artifact copy
  budget=$(( DEADLINE - now - 2100 ))
  if [ "$budget" -lt 300 ]; then
    say "no budget left for leg2 ($budget s)"; exit 2
  fi
  say "leg2: --resume auto, time_budget_s=$budget"
  python -u -m dycon_paper_replication_tpu.cli.train_pancreas \
    "${FLAGS[@]}" --resume auto --time_budget_s "$budget" \
    >"$WORK/leg2.log" 2>&1
  rc=$?
  say "leg2 rc=$rc"
  [ $rc -eq 0 ] && touch "$WORK/leg2.done"
fi

# 3: artifacts land in-repo regardless of how far training got
RUN_DIR=$(ls -d "$RUNS"/PancreasCT/*max_iterations20000* 2>/dev/null | head -1)
if [ -n "${RUN_DIR:-}" ]; then
  cp "$RUN_DIR/metrics.jsonl" bench_results/r04_canonical20k_metrics.jsonl 2>/dev/null
  say "metrics.jsonl copied ($(wc -l <bench_results/r04_canonical20k_metrics.jsonl) lines)"
fi

# 4: dense test eval (reference protocol) if the run completed and time remains
last_it=$(grep -oE 'Iteration [0-9]+ :' "$WORK/leg2.log" 2>/dev/null | tail -1 | grep -oE '[0-9]+' || echo 0)
now=$(date +%s)
if [ "${last_it:-0}" -ge 20000 ] && [ $(( DEADLINE - now )) -ge 1500 ]; then
  say "dense test eval (canonical stride 16/4, patch 96^3)"
  python -u -m dycon_paper_replication_tpu.cli.test_pancreas \
    --root_path "$DATA" --snapshot_root "$RUNS" --max_iterations 20000 \
    >"$WORK/test_eval.log" 2>&1
  say "test eval rc=$? (tail below)"
  tail -8 "$WORK/test_eval.log" | tee -a "$LOG"
  cp "$WORK/test_eval.log" bench_results/r04_canonical20k_test_eval.log 2>/dev/null
fi
say "CANONICAL-20K ORCHESTRATOR DONE"
