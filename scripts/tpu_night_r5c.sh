#!/bin/bash
# Round-5 TPU chain, v4. The v3 chain (tpu_night_r5b.sh) died at iter
# 8055/20000 when the host VM rebooted AGAIN at the session boundary —
# and this time we learned that .scratch/ (gitignored) does NOT survive
# reboots either: ONLY git-committed state persists. v4 differences:
#   * no targeted-pytest preamble: the identical tree passed it at
#     01:48 UTC today (53 passed, bench_results/r05_night_chain.log);
#     every minute goes to the 20k run instead.
#   * legs run from a CODE SNAPSHOT under .scratch/snap so the builder
#     can keep editing the repo without changing a live 20k run's code
#     mid-flight.
#   * checkpoint insurance: after any leg that crosses a 6000-iter
#     milestone (and at the end), the newest checkpoint tree is tarred
#     into bench_results/ and committed — a reboot now costs at most
#     ~6k iters, not the whole run.
#
# Sequence (strictly serial — ONE TPU process at a time):
#   1. canonical Pancreas 20k: datagen -> resume-leg loop -> dense
#      offline eval on the best checkpoint (reference protocol,
#      /root/reference/code/run_Panc.sh + test_Pancreas.py:58-72)
#   2. bench.py confirm (round-5 inference FLOP cuts)
#   3. canonical-geometry SSL ablation legs until HARD_STOP - 300
#
# Usage: tpu_night_r5c.sh <hard_stop_epoch_s>
set -u
cd "$(dirname "$0")/.."
REPO="$(pwd)"
export JAX_COMPILATION_CACHE_DIR="$REPO/.jax_cache"

HARD_STOP="${1:?usage: tpu_night_r5c.sh <hard_stop_epoch_s>}"
WORK="$REPO/.scratch/canon20k"
SNAP="$REPO/.scratch/snap"
DATA="$WORK/Pancreas"
RUNS="$WORK/runs"
LOG="$WORK/chain_r5c.log"
mkdir -p "$WORK" bench_results
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

# ---- code snapshot (legs import from here, not the live repo) ----------
mkdir -p "$SNAP"
tar -cf - --exclude .git --exclude .scratch --exclude .jax_cache \
    --exclude bench_results --exclude '__pycache__' . | tar -xf - -C "$SNAP"
say "code snapshot -> $SNAP (HEAD $(git rev-parse --short HEAD))"

commit_artifacts() {
  git add bench_results BASELINE.md 2>/dev/null
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -m "$1" --quiet && say "committed: $1"
  fi
}

refresh_artifacts() {
  cp "$LOG" bench_results/r05_night_chain_v4.log 2>/dev/null
  RUN_DIR=$(ls -d "$RUNS"/PancreasCT/*max_iterations20000* 2>/dev/null | head -1)
  [ -n "${RUN_DIR:-}" ] && cp "$RUN_DIR/metrics.jsonl" bench_results/r05_canonical20k_metrics.jsonl 2>/dev/null
  cp /tmp/abl_canon/orchestrator.log bench_results/r05_ablation_canonical_orchestrator.log 2>/dev/null
}

last_iter() {
  grep -hoE 'Iteration [0-9]+ :' "$WORK"/leg*.log 2>/dev/null \
    | grep -oE '[0-9]+' | sort -n | tail -1
}

CKPT_MILESTONE=0
ckpt_insurance() {
  # Tar the newest iter_* checkpoint (+ best) so a reboot cannot erase
  # the run again. Same path every time: git history keeps ~1 blob per
  # 6k-iter milestone.
  RUN_DIR=$(ls -d "$RUNS"/PancreasCT/*max_iterations20000* 2>/dev/null | head -1)
  [ -z "${RUN_DIR:-}" ] && return
  NEWEST=$(ls -d "$RUN_DIR"/iter_* "$RUN_DIR"/*/iter_* 2>/dev/null \
    | awk -F'iter_' '{n=$NF; sub(/_.*/,"",n); print n, $0}' \
    | sort -n | tail -1 | cut -d' ' -f2-)
  [ -z "${NEWEST:-}" ] && return
  BEST=$(ls -d "$RUN_DIR"/*best_model* "$RUN_DIR"/*/*best_model* 2>/dev/null | head -1)
  tar -czf bench_results/r05_ckpt_latest.tar.gz -C "$RUN_DIR" \
    $(realpath --relative-to="$RUN_DIR" "$NEWEST") \
    ${BEST:+$(realpath --relative-to="$RUN_DIR" "$BEST")} 2>>"$LOG"
  SZ=$(stat -c %s bench_results/r05_ckpt_latest.tar.gz 2>/dev/null || echo 0)
  say "ckpt insurance: $(basename "$NEWEST") (${SZ} bytes)"
  if [ "$SZ" -gt 350000000 ]; then
    say "insurance tar too large to commit (${SZ} B) — keeping on disk only"
    return
  fi
  git add -f bench_results/r05_ckpt_latest.tar.gz
  commit_artifacts "Checkpoint insurance: canonical 20k at $(basename "$NEWEST")"
}

say "night chain v4 started; hard stop $(date -d @"$HARD_STOP")"

# ---- background artifact refresher ------------------------------------
(
  while [ "$(date +%s)" -lt "$HARD_STOP" ] && [ ! -e "$WORK/chain.done" ]; do
    sleep 1500
    refresh_artifacts
    commit_artifacts "Refresh round-5 chain artifacts (in progress)"
  done
) &
REFRESHER=$!

# ---- 1. canonical 20k: datagen -> legs -> dense eval ---------------------
if [ ! -e "$DATA/train.list" ]; then
  say "datagen: 62/20 synthetic Pancreas at (128,128,112)"
  (cd "$SNAP" && python -c "
from dycon_paper_replication_tpu.data.synthetic import make_pancreas
make_pancreas('$DATA', n_train=62, n_test=20, shape=(128,128,112))
") >>"$LOG" 2>&1 || say "DATAGEN FAILED"
fi

leg=0
noprog=0
it=$(last_iter); it=${it:-0}
while [ "$it" -lt 20000 ]; do
  now=$(date +%s)
  budget=$(( HARD_STOP - now - 2400 ))   # keep room for eval+bench
  if [ "$budget" -lt 600 ]; then say "no budget for leg$leg (iter $it)"; break; fi
  [ "$budget" -gt 3300 ] && budget=3300
  resume_flags=()
  [ "$it" -gt 0 ] && resume_flags=(--resume auto)
  say "leg$leg: from iter $it, budget ${budget}s"
  (cd "$SNAP" && python -u -m dycon_paper_replication_tpu.cli.train_pancreas \
    --root_dir "$DATA" --snapshot_root "$RUNS" \
    --max_iterations 20000 --save_every 1000 --compute_dtype bfloat16 \
    "${resume_flags[@]}" --time_budget_s "$budget") >"$WORK/leg$leg.log" 2>&1
  rc=$?
  new_it=$(last_iter); new_it=${new_it:-0}
  say "leg$leg rc=$rc: iter $it -> $new_it"
  refresh_artifacts
  commit_artifacts "Refresh round-5 chain artifacts (leg$leg done)"
  if [ $(( new_it / 6000 )) -gt "$CKPT_MILESTONE" ]; then
    CKPT_MILESTONE=$(( new_it / 6000 ))
    ckpt_insurance
  fi
  if [ "$new_it" -le "$it" ]; then
    noprog=$(( noprog + 1 ))
    say "leg$leg made no progress (strike $noprog/3)"
    cp "$WORK/leg$leg.log" bench_results/r05_leg_noprogress.log 2>/dev/null
    commit_artifacts "Canonical 20k: no-progress leg log"
    if [ "$noprog" -ge 3 ]; then say "three no-progress legs — aborting finish-up loop"; break; fi
    sleep 900   # relay weather / possible stale claim — settle before retrying
  else
    noprog=0
  fi
  it=$new_it
  leg=$(( leg + 1 ))
  sleep 20
done

now=$(date +%s)
if [ "$it" -ge 20000 ] && [ $(( HARD_STOP - now )) -gt 1200 ]; then
  say "dense test eval on best checkpoint (reference protocol: patch 96^3, stride 16/4)"
  (cd "$SNAP" && python -u -m dycon_paper_replication_tpu.cli.test_pancreas \
    --root_path "$DATA" --snapshot_root "$RUNS" \
    --max_iterations 20000) >"$WORK/test_eval_r5.log" 2>&1
  say "dense eval rc=$?"
  tail -8 "$WORK/test_eval_r5.log" | tee -a "$LOG"
  cp "$WORK/test_eval_r5.log" bench_results/r05_canonical20k_test_eval.log 2>/dev/null
fi
refresh_artifacts
ckpt_insurance
commit_artifacts "Canonical 20k Pancreas run artifacts (train + dense offline eval)"

# ---- 2. bench confirm ----------------------------------------------------
now=$(date +%s)
if [ $(( HARD_STOP - now )) -gt 1500 ]; then
  say "bench.py confirm"
  (cd "$SNAP" && python bench.py) >"$WORK/bench_r5.json" 2>"$WORK/bench_r5.err"
  say "bench: $(cat "$WORK/bench_r5.json")"
  cp "$WORK/bench_r5.json" bench_results/r05_bench_confirm.json 2>/dev/null
  commit_artifacts "Bench confirm (round-5 chain v4)"
else
  say "skip bench confirm (insufficient budget)"
fi

# ---- 3. canonical ablation -----------------------------------------------
now=$(date +%s)
ABL_DEADLINE=$(( HARD_STOP - 300 ))
if [ $(( ABL_DEADLINE - now )) -gt 2400 ]; then
  bash "$SNAP/scripts/exp_ablation_canonical.sh" "$ABL_DEADLINE" >>"$WORK/abl_driver.log" 2>&1
  say "ablation orchestrator finished"
  refresh_artifacts
  commit_artifacts "Canonical-geometry SSL ablation artifacts"
else
  say "skip ablation (insufficient budget)"
fi

kill "$REFRESHER" 2>/dev/null
refresh_artifacts
commit_artifacts "Round-5 chain log (final)"
say "NIGHT CHAIN v4 DONE"
touch "$WORK/chain.done"
