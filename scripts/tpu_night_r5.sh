#!/bin/bash
# Round-5 overnight TPU chain, v2 (v1 was stopped when the canonical
# run's host-RSS leak surfaced — see config.host_rss_exit_gb). One
# nohup'd process owns the chip for the rest of the round so a session
# crash cannot orphan the plan.
#
# Sequence (strictly serial — ONE TPU process at a time, and never a
# CPU-heavy job beside a live TPU process; CLAUDE.md relay discipline):
#   0. wait for any live canonical-run leg to exit
#   1. targeted pytest of the new watchdog/pipelined-loop paths
#   2. finish-up loop: fresh --resume auto legs (watchdog-bounded)
#      until the canonical Pancreas run reaches 20,000 iterations, then
#      the dense offline eval (reference protocol, test_Pancreas.py:58-72)
#   3. full CPU pytest suite
#   4. bench.py confirm (this round's inference FLOP cuts)
#   5. canonical-geometry SSL ablation until DEADLINE = HARD_STOP - 300
# plus a low-rate artifact-refresh committer for the stall detector.
#
# Usage: tpu_night_r5.sh <hard_stop_epoch_s> [wait_pid]
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"

HARD_STOP="${1:?usage: tpu_night_r5.sh <hard_stop_epoch_s> [wait_pid]}"
WAIT_PID="${2:-0}"
LOG=/tmp/night_r5.log
RUNS=/tmp/canon20k/runs
DATA=/tmp/canon20k/Pancreas
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_artifacts() {
  git add bench_results BASELINE.md 2>/dev/null
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -m "$1" --quiet && say "committed: $1"
  fi
}

last_iter() {
  grep -hoE 'Iteration [0-9]+ :' /tmp/canon20k/leg*.log 2>/dev/null \
    | grep -oE '[0-9]+' | sort -n | tail -1
}

say "night chain v2 started; hard stop $(date -d @"$HARD_STOP")"

# ---- 0. wait for the live leg ------------------------------------------
if [ "$WAIT_PID" -gt 0 ]; then
  while kill -0 "$WAIT_PID" 2>/dev/null; do
    if [ "$(date +%s)" -ge "$HARD_STOP" ]; then say "hard stop while waiting"; exit 1; fi
    sleep 30
  done
  say "leg pid $WAIT_PID exited"
  sleep 45   # let the relay settle after the long-lived claim
fi

# ---- background artifact refresher ------------------------------------
(
  while [ "$(date +%s)" -lt "$HARD_STOP" ]; do
    sleep 3000
    cp /tmp/abl_canon/orchestrator.log bench_results/r05_ablation_canonical_orchestrator.log 2>/dev/null
    cp "$LOG" bench_results/r05_night_chain.log 2>/dev/null
    commit_artifacts "Refresh overnight experiment artifacts (chain in progress)"
  done
) &
REFRESHER=$!

# ---- 1. targeted pytest of the new trainer paths ------------------------
say "pytest (targeted): watchdog + pipelined loop + bits"
python -m pytest tests/test_train.py -q -k "watchdog or fetch_ahead or resume or full_loop" \
  tests/test_bits.py >/tmp/pytest_target.log 2>&1
rc=$?
say "targeted pytest rc=$rc : $(tail -1 /tmp/pytest_target.log)"
if [ $rc -ne 0 ]; then
  say "TARGETED PYTEST FAILED — finish-up legs still run (watchdog fails open; time_budget_s bounds them)"
  cp /tmp/pytest_target.log bench_results/r05_pytest_target_FAILED.log 2>/dev/null
  commit_artifacts "Targeted pytest FAILURE log (overnight chain)"
fi

# ---- 2. finish-up loop to 20k + dense eval ------------------------------
leg=5
it=$(last_iter); it=${it:-0}
while [ "$it" -lt 20000 ]; do
  now=$(date +%s)
  budget=$(( HARD_STOP - now - 2700 ))   # keep room for eval+pytest+bench
  if [ "$budget" -lt 600 ]; then say "no budget for leg$leg (iter $it)"; break; fi
  # per-leg cap is generous: the host-RSS watchdog (not this budget) is
  # the OOM guard, so a leg whose gc/delete mitigations hold runs long
  [ "$budget" -gt 3300 ] && budget=3300
  say "leg$leg: --resume auto from iter $it, budget ${budget}s"
  python -u -m dycon_paper_replication_tpu.cli.train_pancreas \
    --root_dir "$DATA" --snapshot_root "$RUNS" \
    --max_iterations 20000 --save_every 1000 --compute_dtype bfloat16 \
    --resume auto --time_budget_s "$budget" >"/tmp/canon20k/leg$leg.log" 2>&1
  rc=$?
  new_it=$(last_iter); new_it=${new_it:-0}
  say "leg$leg rc=$rc: iter $it -> $new_it"
  if [ "$new_it" -le "$it" ]; then
    say "leg$leg made no progress — aborting finish-up loop"
    break
  fi
  it=$new_it
  leg=$(( leg + 1 ))
  sleep 20
done
RUN_DIR=$(ls -d "$RUNS"/PancreasCT/*max_iterations20000* 2>/dev/null | head -1)
[ -n "${RUN_DIR:-}" ] && cp "$RUN_DIR/metrics.jsonl" bench_results/r05_canonical20k_metrics.jsonl 2>/dev/null

now=$(date +%s)
if [ "$it" -ge 20000 ] && [ $(( HARD_STOP - now )) -gt 1500 ]; then
  say "dense test eval on best checkpoint (reference protocol: patch 96^3, stride 16/4)"
  python -u -m dycon_paper_replication_tpu.cli.test_pancreas \
    --root_path "$DATA" --snapshot_root "$RUNS" \
    --max_iterations 20000 >/tmp/canon20k/test_eval_r5.log 2>&1
  say "dense eval rc=$?"
  tail -8 /tmp/canon20k/test_eval_r5.log | tee -a "$LOG"
  cp /tmp/canon20k/test_eval_r5.log bench_results/r05_canonical20k_test_eval.log 2>/dev/null
fi
commit_artifacts "Canonical 20k Pancreas run artifacts (train to 20k + dense offline eval)"

# ---- 3. full CPU pytest --------------------------------------------------
now=$(date +%s)
if [ $(( HARD_STOP - now )) -gt 3000 ]; then
  say "pytest: full suite"
  python -m pytest tests/ -q >/tmp/pytest_r5.log 2>&1
  say "pytest rc=$? : $(tail -1 /tmp/pytest_r5.log)"
  cp /tmp/pytest_r5.log bench_results/r05_pytest.log 2>/dev/null
  commit_artifacts "Full-suite pytest log (overnight chain)"
else
  say "skip full pytest (insufficient budget)"
fi

# ---- 4. bench confirm ----------------------------------------------------
now=$(date +%s)
if [ $(( HARD_STOP - now )) -gt 2400 ]; then
  say "bench.py confirm"
  python bench.py >/tmp/bench_r5.json 2>/tmp/bench_r5.err
  say "bench: $(cat /tmp/bench_r5.json)"
  cp /tmp/bench_r5.json bench_results/r05_bench_confirm.json 2>/dev/null
  commit_artifacts "Bench confirm after inference FLOP cuts (inv-cnt precompute + bit-packed labels)"
else
  say "skip bench confirm (insufficient budget)"
fi

# ---- 5. canonical ablation -----------------------------------------------
now=$(date +%s)
ABL_DEADLINE=$(( HARD_STOP - 300 ))
if [ $(( ABL_DEADLINE - now )) -gt 2400 ]; then
  bash scripts/exp_ablation_canonical.sh "$ABL_DEADLINE" >>/tmp/abl_canon_driver.log 2>&1
  say "ablation orchestrator finished"
  commit_artifacts "Canonical-geometry SSL ablation artifacts"
else
  say "skip ablation (insufficient budget)"
fi

kill "$REFRESHER" 2>/dev/null
cp "$LOG" bench_results/r05_night_chain.log 2>/dev/null
commit_artifacts "Overnight chain log"
say "NIGHT CHAIN DONE"
touch /tmp/night_r5.done
