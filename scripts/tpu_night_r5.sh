#!/bin/bash
# Round-5 overnight TPU chain. One nohup'd process owns the chip for the
# rest of the round so a session crash cannot orphan the plan (the
# canonical-20k orchestrator already survived one crash this way).
#
# Sequence (strictly serial — ONE TPU process at a time, and never a
# CPU-heavy job beside a live TPU process; CLAUDE.md relay discipline):
#   0. wait for the canonical-20k orchestrator to finish, commit its
#      artifacts
#   1. full CPU pytest suite (TPU idle) — logged, non-gating
#   2. bench.py confirm (measures this round's inference FLOP cuts:
#      precomputed inv-cnt normalizer + bit-packed label D2H)
#   3. canonical-geometry SSL ablation (exp_ablation_canonical.sh),
#      deadline = HARD_STOP - 300
#   4. if >= 3600 s remain: BraTS19 endurance slice
# plus a low-rate artifact-refresh committer so the driver's stall
# detector sees progress during the multi-hour ablation stretch.
#
# Usage: tpu_night_r5.sh <hard_stop_epoch_s>
#   hard_stop = wall time by which ALL our processes must be gone
#   (driver runs bench.py + dryrun on the TPU right after round end).
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"

HARD_STOP="${1:?usage: tpu_night_r5.sh <hard_stop_epoch_s>}"
LOG=/tmp/night_r5.log
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_artifacts() {
  # commit only bench_results/ + BASELINE.md; nothing else, to avoid
  # racing an interactive session's commits
  git add bench_results BASELINE.md 2>/dev/null
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -m "$1" --quiet && say "committed: $1"
  fi
}

say "night chain started; hard stop $(date -d @"$HARD_STOP")"

# ---- 0. wait for the canonical-20k orchestrator -----------------------
CANON_PID=$(cat /tmp/canon_r5.pid 2>/dev/null || echo 0)
while :; do
  grep -q "CANONICAL-20K-R5 ORCHESTRATOR DONE" /tmp/canon20k/orchestrator_r5.log 2>/dev/null && break
  if ! kill -0 "$CANON_PID" 2>/dev/null; then
    # orchestrator pid is gone; give any final file writes a minute,
    # re-check the marker, then proceed either way
    sleep 60
    grep -q "CANONICAL-20K-R5 ORCHESTRATOR DONE" /tmp/canon20k/orchestrator_r5.log 2>/dev/null || \
      say "canon20k orchestrator died without DONE marker — proceeding"
    break
  fi
  if [ "$(date +%s)" -ge "$HARD_STOP" ]; then say "hard stop while waiting"; exit 1; fi
  sleep 120
done
say "canonical-20k phase complete"
sleep 30   # let the relay settle after the long-lived claim

# ---- 0b. finish-up: leg3's budget boundary is ~the projected 20k
# completion time; if it clean-exited a few hundred iterations short,
# resume for the remainder and run the dense eval ourselves ----------
last_it=$(grep -oE 'Iteration [0-9]+ :' /tmp/canon20k/leg3.log 2>/dev/null | tail -1 | grep -oE '[0-9]+' || echo 0)
now=$(date +%s)
if [ "${last_it:-0}" -lt 20000 ] && [ $(( HARD_STOP - now )) -gt 3600 ]; then
  rem=$(( 20000 - last_it ))
  budget=$(( rem * 7 / 8 + 900 ))   # ~0.7 s/iter + resume/compile slack
  say "finish-up: leg3 stopped at $last_it — resuming for $rem iters (budget ${budget}s)"
  python -u -m dycon_paper_replication_tpu.cli.train_pancreas \
    --root_dir /tmp/canon20k/Pancreas --snapshot_root /tmp/canon20k/runs \
    --max_iterations 20000 --save_every 1000 --compute_dtype bfloat16 \
    --resume auto --time_budget_s "$budget" >/tmp/canon20k/leg4.log 2>&1
  say "finish-up rc=$? (last: $(grep -oE 'Iteration [0-9]+ :' /tmp/canon20k/leg4.log | tail -1))"
  RUN_DIR=$(ls -d /tmp/canon20k/runs/PancreasCT/*max_iterations20000* 2>/dev/null | head -1)
  [ -n "${RUN_DIR:-}" ] && cp "$RUN_DIR/metrics.jsonl" bench_results/r05_canonical20k_metrics.jsonl 2>/dev/null
fi
now=$(date +%s)
if [ ! -s /tmp/canon20k/test_eval_r5.log ] && [ $(( HARD_STOP - now )) -gt 3000 ]; then
  final_it=$(grep -hoE 'Iteration [0-9]+ :' /tmp/canon20k/leg3.log /tmp/canon20k/leg4.log 2>/dev/null | tail -1 | grep -oE '[0-9]+' || echo 0)
  if [ "${final_it:-0}" -ge 20000 ]; then
    say "dense test eval on best checkpoint (orchestrator skipped it)"
    python -u -m dycon_paper_replication_tpu.cli.test_pancreas \
      --root_path /tmp/canon20k/Pancreas --snapshot_root /tmp/canon20k/runs \
      --max_iterations 20000 >/tmp/canon20k/test_eval_r5.log 2>&1
    say "dense eval rc=$?"
    cp /tmp/canon20k/test_eval_r5.log bench_results/r05_canonical20k_test_eval.log 2>/dev/null
  fi
fi
cp /tmp/canon20k/orchestrator_r5.log bench_results/r05_canonical20k_orchestrator.log 2>/dev/null
tail -6 /tmp/canon20k/test_eval_r5.log 2>/dev/null | tee -a "$LOG"
commit_artifacts "Canonical 20k Pancreas run artifacts (train to 20k + dense offline eval)"

# ---- background artifact refresher ------------------------------------
(
  while [ "$(date +%s)" -lt "$HARD_STOP" ]; do
    sleep 3000
    cp /tmp/abl_canon/orchestrator.log bench_results/r05_ablation_canonical_orchestrator.log 2>/dev/null
    commit_artifacts "Refresh overnight experiment artifacts (ablation in progress)"
  done
) &
REFRESHER=$!

# ---- 1. full CPU pytest (TPU idle) ------------------------------------
say "pytest: full suite"
python -m pytest tests/ -x -q >/tmp/pytest_r5.log 2>&1
say "pytest rc=$? : $(tail -1 /tmp/pytest_r5.log)"
cp /tmp/pytest_r5.log bench_results/r05_pytest.log 2>/dev/null

# ---- 2. bench confirm ---------------------------------------------------
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

# ---- 3. canonical ablation ---------------------------------------------
now=$(date +%s)
ABL_DEADLINE=$(( HARD_STOP - 300 ))
if [ $(( ABL_DEADLINE - now )) -gt 2400 ]; then
  bash scripts/exp_ablation_canonical.sh "$ABL_DEADLINE" >>/tmp/abl_canon_driver.log 2>&1
  say "ablation orchestrator finished"
  commit_artifacts "Canonical-geometry 3-seed SSL ablation artifacts"
else
  say "skip ablation (insufficient budget)"
fi

# ---- 4. BraTS endurance if room ----------------------------------------
now=$(date +%s)
if [ $(( HARD_STOP - now )) -gt 3900 ]; then
  bash scripts/exp_brats19_endurance.sh $(( HARD_STOP - 300 )) >>/tmp/brats_endur_driver.log 2>&1
  say "brats endurance finished"
  commit_artifacts "BraTS19 canonical-geometry endurance slice artifacts"
else
  say "skip brats endurance ($(( HARD_STOP - now ))s left)"
fi

kill "$REFRESHER" 2>/dev/null
cp "$LOG" bench_results/r05_night_chain.log 2>/dev/null
commit_artifacts "Overnight chain log"
say "NIGHT CHAIN DONE"
touch /tmp/night_r5.done
