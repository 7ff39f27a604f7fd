#!/bin/bash
# BraTS19 canonical-geometry endurance slice with mid-run SIGKILL +
# resume-in-anger (VERDICT r4 next #5) — the BraTS analogue of round-4's
# Pancreas exp_canonical_20k.sh: reference protocol config
# (run_brats19.sh: labelnum 25 / 249 train cases, bs 8 (4 labeled),
# patch 96^3, max_iterations 20000) over a synthetic canonical tree
# (249 train / 24 val at (160,160,128) -> random-cropped 96^3 patches).
#
# leg 1 trains fresh and is deliberately SIGKILL'd at ~iter 700 (right
# after a periodic save, steady state); leg 2 `--resume auto` runs to
# its internal time budget. Relay discipline: internal --time_budget_s
# clean exits only; the SIGKILL is the experiment.
#
# Usage: exp_brats19_endurance.sh <deadline_epoch_s>
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"

DEADLINE="${1:?usage: exp_brats19_endurance.sh <deadline_epoch_s>}"
WORK=/tmp/brats_endur
DATA="$WORK/BraTS2019"
RUNS="$WORK/runs"
mkdir -p "$WORK" bench_results
LOG="$WORK/orchestrator.log"
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

KILL_AT=700
FLAGS=(--root_dir "$DATA" --snapshot_root "$RUNS"
       --max_iterations 20000 --save_every 500
       --compute_dtype bfloat16)

if [ ! -e "$DATA/train.txt" ]; then
  say "generating synthetic canonical BraTS tree (249 train / 24 val at 128,128,96)"
  # volume size is not protocol-pinned for training (the 96^3 random
  # crop is); 128,128,96 keeps datagen/disk sane at the full 249-case
  # labelnum-25 scarcity
  python -c "
from dycon_paper_replication_tpu.data.synthetic import make_brats19
make_brats19('$DATA', n_train=249, n_test=24, shape=(128,128,96))
" >>"$LOG" 2>&1 || { say "datagen FAILED"; exit 1; }
fi

if [ ! -e "$WORK/leg1.done" ]; then
  now=$(date +%s)
  b1=$(( DEADLINE - now - 600 ))
  say "leg1: fresh run, SIGKILL scheduled at iter >= $KILL_AT"
  python -u -m dycon_paper_replication_tpu.cli.train_brats19 \
    "${FLAGS[@]}" --time_budget_s "$b1" >"$WORK/leg1.log" 2>&1 &
  PID=$!
  echo "$PID" >"$WORK/leg1.pid"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 15
    it=$(grep -oE 'Iteration [0-9]+ :' "$WORK/leg1.log" | tail -1 | grep -oE '[0-9]+' || echo 0)
    if [ "${it:-0}" -ge "$KILL_AT" ]; then
      say "leg1 reached iteration $it — SIGKILL $PID (deliberate mid-run kill)"
      kill -9 "$PID"
      break
    fi
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      say "deadline before kill point; leg1 internal budget will stop it"
      break
    fi
  done
  wait "$PID" 2>/dev/null
  say "leg1 ended (last logged iteration: ${it:-?})"
  touch "$WORK/leg1.done"
  sleep 60
fi

if [ ! -e "$WORK/leg2.done" ]; then
  now=$(date +%s)
  budget=$(( DEADLINE - now - 300 ))
  if [ "$budget" -lt 300 ]; then say "no budget for leg2 ($budget s)"; exit 2; fi
  say "leg2: --resume auto, time_budget_s=$budget"
  python -u -m dycon_paper_replication_tpu.cli.train_brats19 \
    "${FLAGS[@]}" --resume auto --time_budget_s "$budget" \
    >"$WORK/leg2.log" 2>&1
  rc=$?
  say "leg2 rc=$rc"
  [ $rc -eq 0 ] && touch "$WORK/leg2.done"
fi

RUN_DIR=$(ls -d "$RUNS"/BraTS2019/*max_iterations20000* 2>/dev/null | head -1)
if [ -n "${RUN_DIR:-}" ]; then
  cp "$RUN_DIR/metrics.jsonl" bench_results/r05_brats_endurance_metrics.jsonl 2>/dev/null
  say "metrics.jsonl copied ($(wc -l <bench_results/r05_brats_endurance_metrics.jsonl) lines)"
fi
cp "$LOG" bench_results/r05_brats_endurance_orchestrator.log 2>/dev/null
say "BRATS-ENDURANCE ORCHESTRATOR DONE"
