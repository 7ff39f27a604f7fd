#!/bin/bash
# Round-5 TPU chain, v3. The v2 chain (tpu_night_r5.sh) was killed by a
# host reboot that also wiped /tmp — taking the canonical-run checkpoint
# tree and every night-chain artifact with it. v3 differences:
#   * ALL canonical-run state lives under $REPO/.scratch (gitignored,
#     survives reboots) instead of /tmp.
#   * the 20k run starts FRESH (the round-4 tree is gone) — datagen is
#     idempotent and the finish-up loop is the same --resume auto leg
#     loop bounded by the host-RSS watchdog.
#   * artifacts (metrics.jsonl, orchestrator log, partial ablation rows)
#     are copied into bench_results/ and committed every ~25 min, so a
#     second crash cannot erase evidence again.
#
# Sequence (strictly serial — ONE TPU process at a time; CLAUDE.md
# relay discipline):
#   1. targeted pytest of round-5-touched paths (CPU, TPU idle)
#   2. canonical Pancreas 20k: datagen -> resume-leg loop -> dense
#      offline eval on the best checkpoint (reference protocol,
#      /root/reference/code/run_Panc.sh + test_Pancreas.py:58-72)
#   3. bench.py confirm (round-5 inference FLOP cuts)
#   4. canonical-geometry SSL ablation until HARD_STOP - 300
#
# Usage: tpu_night_r5b.sh <hard_stop_epoch_s>
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"

HARD_STOP="${1:?usage: tpu_night_r5b.sh <hard_stop_epoch_s>}"
WORK=.scratch/canon20k
DATA="$WORK/Pancreas"
RUNS="$WORK/runs"
LOG="$WORK/chain_r5b.log"
mkdir -p "$WORK" bench_results
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_artifacts() {
  git add bench_results BASELINE.md 2>/dev/null
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -m "$1" --quiet && say "committed: $1"
  fi
}

refresh_artifacts() {
  cp "$LOG" bench_results/r05_night_chain.log 2>/dev/null
  RUN_DIR=$(ls -d "$RUNS"/PancreasCT/*max_iterations20000* 2>/dev/null | head -1)
  [ -n "${RUN_DIR:-}" ] && cp "$RUN_DIR/metrics.jsonl" bench_results/r05_canonical20k_metrics.jsonl 2>/dev/null
  cp /tmp/abl_canon/orchestrator.log bench_results/r05_ablation_canonical_orchestrator.log 2>/dev/null
}

last_iter() {
  grep -hoE 'Iteration [0-9]+ :' "$WORK"/leg*.log 2>/dev/null \
    | grep -oE '[0-9]+' | sort -n | tail -1
}

say "night chain v3 started; hard stop $(date -d @"$HARD_STOP")"

# ---- background artifact refresher ------------------------------------
(
  while [ "$(date +%s)" -lt "$HARD_STOP" ] && [ ! -e "$WORK/chain.done" ]; do
    sleep 1500
    refresh_artifacts
    commit_artifacts "Refresh round-5 chain artifacts (in progress)"
  done
) &
REFRESHER=$!

# ---- 1. targeted pytest of round-5-touched paths -------------------------
say "pytest (targeted): trainer watchdog/pipeline + bit-pack + sliding window"
python -m pytest tests/test_train.py tests/test_bits.py tests/test_sliding_window.py -q \
  >"$WORK/pytest_target.log" 2>&1
rc=$?
say "targeted pytest rc=$rc : $(tail -1 "$WORK/pytest_target.log")"
if [ $rc -ne 0 ]; then
  say "TARGETED PYTEST FAILED — legs still run (watchdog fails open; time_budget_s bounds them)"
  cp "$WORK/pytest_target.log" bench_results/r05_pytest_target_FAILED.log
  commit_artifacts "Targeted pytest FAILURE log (round-5 chain)"
fi

# ---- 2. canonical 20k: datagen -> legs -> dense eval ---------------------
if [ ! -e "$DATA/train.list" ]; then
  say "datagen: 62/20 synthetic Pancreas at (128,128,112)"
  python -c "
from dycon_paper_replication_tpu.data.synthetic import make_pancreas
make_pancreas('$DATA', n_train=62, n_test=20, shape=(128,128,112))
" >>"$LOG" 2>&1 || say "DATAGEN FAILED"
fi

leg=0
noprog=0
it=$(last_iter); it=${it:-0}
while [ "$it" -lt 20000 ]; do
  now=$(date +%s)
  budget=$(( HARD_STOP - now - 2700 ))   # keep room for eval+bench
  if [ "$budget" -lt 600 ]; then say "no budget for leg$leg (iter $it)"; break; fi
  [ "$budget" -gt 3300 ] && budget=3300
  resume_flags=()
  [ "$it" -gt 0 ] && resume_flags=(--resume auto)
  say "leg$leg: from iter $it, budget ${budget}s"
  python -u -m dycon_paper_replication_tpu.cli.train_pancreas \
    --root_dir "$DATA" --snapshot_root "$RUNS" \
    --max_iterations 20000 --save_every 1000 --compute_dtype bfloat16 \
    "${resume_flags[@]}" --time_budget_s "$budget" >"$WORK/leg$leg.log" 2>&1
  rc=$?
  new_it=$(last_iter); new_it=${new_it:-0}
  say "leg$leg rc=$rc: iter $it -> $new_it"
  refresh_artifacts
  if [ "$new_it" -le "$it" ]; then
    noprog=$(( noprog + 1 ))
    say "leg$leg made no progress (strike $noprog/2)"
    cp "$WORK/leg$leg.log" bench_results/r05_leg_noprogress.log 2>/dev/null
    commit_artifacts "Canonical 20k: no-progress leg log"
    if [ "$noprog" -ge 2 ]; then say "two no-progress legs — aborting finish-up loop"; break; fi
    sleep 300   # transient relay weather — settle before retrying
  else
    noprog=0
  fi
  it=$new_it
  leg=$(( leg + 1 ))
  sleep 20
done

now=$(date +%s)
if [ "$it" -ge 20000 ] && [ $(( HARD_STOP - now )) -gt 1500 ]; then
  say "dense test eval on best checkpoint (reference protocol: patch 96^3, stride 16/4)"
  python -u -m dycon_paper_replication_tpu.cli.test_pancreas \
    --root_path "$DATA" --snapshot_root "$RUNS" \
    --max_iterations 20000 >"$WORK/test_eval_r5.log" 2>&1
  say "dense eval rc=$?"
  tail -8 "$WORK/test_eval_r5.log" | tee -a "$LOG"
  cp "$WORK/test_eval_r5.log" bench_results/r05_canonical20k_test_eval.log 2>/dev/null
fi
refresh_artifacts
commit_artifacts "Canonical 20k Pancreas run artifacts (train + dense offline eval)"

# ---- 3. bench confirm ----------------------------------------------------
now=$(date +%s)
if [ $(( HARD_STOP - now )) -gt 1800 ]; then
  say "bench.py confirm"
  python bench.py >"$WORK/bench_r5.json" 2>"$WORK/bench_r5.err"
  say "bench: $(cat "$WORK/bench_r5.json")"
  cp "$WORK/bench_r5.json" bench_results/r05_bench_confirm.json 2>/dev/null
  commit_artifacts "Bench confirm after inference FLOP cuts (inv-cnt precompute + bit-packed labels)"
else
  say "skip bench confirm (insufficient budget)"
fi

# ---- 4. canonical ablation -----------------------------------------------
now=$(date +%s)
ABL_DEADLINE=$(( HARD_STOP - 300 ))
if [ $(( ABL_DEADLINE - now )) -gt 2400 ]; then
  bash scripts/exp_ablation_canonical.sh "$ABL_DEADLINE" >>"$WORK/abl_driver.log" 2>&1
  say "ablation orchestrator finished"
  refresh_artifacts
  commit_artifacts "Canonical-geometry SSL ablation artifacts"
else
  say "skip ablation (insufficient budget)"
fi

kill "$REFRESHER" 2>/dev/null
refresh_artifacts
commit_artifacts "Round-5 chain log (final)"
say "NIGHT CHAIN v3 DONE"
touch "$WORK/chain.done"
