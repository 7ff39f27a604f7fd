#!/bin/bash
# Round-5 FINAL tail orchestrator. Runs after the v4 night chain
# (scripts/tpu_night_r5c.sh) finishes, inside the follow-on builder
# session's TPU window. Strictly serial — ONE TPU process at a time
# (CLAUDE.md relay discipline); every deliverable commits its artifacts
# immediately (only git survives the session-boundary reboots).
#
# Sequence (priority order from VERDICT r4 "next round"):
#   0. wait for the chain to write chain.done (never overlap with it)
#   1. finishing legs until the canonical Pancreas run REACHES 20000
#      (snapshot code — the same tree the whole run used)
#   2. dense offline eval on the best checkpoint if the chain's
#      finisher didn't complete it (reference protocol,
#      /root/reference/code/test_Pancreas.py:58-72)
#   3. checkpoint insurance tar of the final iter_20000 tree
#   4. repo bench.py — validates the round-5 inference path (bit-packed
#      D2H + precomputed cnt have never run on the real chip since the
#      reboot wiped .jax_cache) AND warms the compile cache for the
#      round driver's official bench run
#   5. BraTS19 canonical-geometry endurance slice with SIGKILL+resume
#      (VERDICT r4 next #5) in whatever window remains
#   6. summarizer -> bench_results + BASELINE rows
#
# Usage: tpu_tail_r5_final.sh <tail_end_epoch_s>
#   tail_end = wall time by which the TPU must be FREE for the driver.
set -u
cd "$(dirname "$0")/.."
REPO="$(pwd)"
export JAX_COMPILATION_CACHE_DIR="$REPO/.jax_cache"

TAIL_END="${1:?usage: tpu_tail_r5_final.sh <tail_end_epoch_s>}"
WORK="$REPO/.scratch/canon20k"
SNAP="$REPO/.scratch/snap"
DATA="$WORK/Pancreas"
RUNS="$WORK/runs"
LOG="$REPO/.scratch/tail_r5_final.log"
mkdir -p "$REPO/.scratch" bench_results
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

commit_artifacts() {
  # small retry: the chain's refresher may hold the index for a moment
  for _ in 1 2 3; do
    git add bench_results BASELINE.md 2>/dev/null
    if git diff --cached --quiet 2>/dev/null; then return 0; fi
    git commit -m "$1" --quiet && { say "committed: $1"; return 0; }
    sleep 15
  done
  say "commit FAILED: $1"
}

refresh_tail_log() { cp "$LOG" bench_results/r05_tail_final.log 2>/dev/null; }

last_iter() {
  grep -hoE 'Iteration [0-9]+ :' "$WORK"/leg*.log 2>/dev/null \
    | grep -oE '[0-9]+' | sort -n | tail -1
}

tpu_busy() {
  # check-only (never kill by pattern): any python running our CLIs or a
  # bench owns the chip
  pgrep -f 'dycon_paper_replication_tpu.cli|[b]ench.py|[b]ench_real.py' >/dev/null 2>&1
}

# ---- 0. wait for the chain ------------------------------------------------
say "tail orchestrator armed; TPU must be free by $(date -d @"$TAIL_END")"
WAIT_CAP=$(( TAIL_END - 1500 ))
while [ ! -e "$WORK/chain.done" ] && [ "$(date +%s)" -lt "$WAIT_CAP" ]; do
  sleep 60
done
if [ ! -e "$WORK/chain.done" ]; then
  if tpu_busy; then
    # chain still holds the chip this close to the deadline: a wedge or
    # a very long compile. GO-SILENT protocol — do NOT pile a second
    # TPU process on top (CLAUDE.md); just save the logs.
    say "chain never finished and TPU still busy at wait cap — standing down"
    refresh_tail_log; commit_artifacts "Round-5 tail: stood down (chain overran)"
    exit 0
  fi
  say "no chain.done but TPU idle — chain died; proceeding"
fi
say "chain done; tail takes the TPU"

# ---- 1. finishing legs to 20000 ------------------------------------------
EVAL_RESERVE=1500   # dense eval (compile + 20 volumes + host metrics)
BENCH_RESERVE=1500  # repo bench.py validation/warm
it=$(last_iter); it=${it:-0}
leg=0
while [ "$it" -lt 20000 ]; do
  now=$(date +%s)
  budget=$(( TAIL_END - now - EVAL_RESERVE - BENCH_RESERVE ))
  if [ "$budget" -lt 300 ]; then say "no budget for tail leg (iter $it)"; break; fi
  [ "$budget" -gt 3300 ] && budget=3300
  say "tail leg T$leg: from iter $it, budget ${budget}s"
  (cd "$SNAP" && python -u -m dycon_paper_replication_tpu.cli.train_pancreas \
    --root_dir "$DATA" --snapshot_root "$RUNS" \
    --max_iterations 20000 --save_every 1000 --compute_dtype bfloat16 \
    --resume auto --time_budget_s "$budget") >"$WORK/legT$leg.log" 2>&1
  rc=$?
  new_it=$(last_iter); new_it=${new_it:-0}
  say "tail leg T$leg rc=$rc: iter $it -> $new_it"
  RUN_DIR=$(ls -d "$RUNS"/PancreasCT/*max_iterations20000* 2>/dev/null | head -1)
  [ -n "${RUN_DIR:-}" ] && cp "$RUN_DIR/metrics.jsonl" bench_results/r05_canonical20k_metrics.jsonl 2>/dev/null
  refresh_tail_log
  commit_artifacts "Canonical 20k: tail leg to iter $new_it"
  if [ "$new_it" -le "$it" ]; then say "tail leg made no progress — stopping"; break; fi
  it=$new_it
  leg=$(( leg + 1 ))
  sleep 15
done

# ---- 2. dense offline eval (if the chain's finisher didn't) ---------------
EVAL_LOG=bench_results/r05_canonical20k_test_eval.log
now=$(date +%s)
# eval UNCONDITIONALLY (budget permitting): an earlier eval log may
# reflect a sub-20k checkpoint; the deliverable is the table at the
# final reached iteration
if [ $(( TAIL_END - now - BENCH_RESERVE )) -gt 900 ]; then
  say "dense offline eval on best checkpoint (reached iter $it)"
  (cd "$SNAP" && python -u -m dycon_paper_replication_tpu.cli.test_pancreas \
    --root_path "$DATA" --snapshot_root "$RUNS" \
    --max_iterations 20000) >"$WORK/test_eval_tail.log" 2>&1
  say "dense eval rc=$?"
  tail -6 "$WORK/test_eval_tail.log" | tee -a "$LOG"
  if grep -q "FINAL AVERAGE METRICS" "$WORK/test_eval_tail.log"; then
    cp "$WORK/test_eval_tail.log" "$EVAL_LOG"
  else
    cp "$WORK/test_eval_tail.log" bench_results/r05_canonical20k_test_eval_FAILED.log
  fi
  refresh_tail_log
  commit_artifacts "Canonical 20k: dense offline eval (tail)"
fi

# ---- 3. final checkpoint insurance ----------------------------------------
RUN_DIR=$(ls -d "$RUNS"/PancreasCT/*max_iterations20000* 2>/dev/null | head -1)
if [ -n "${RUN_DIR:-}" ]; then
  NEWEST=$(ls -d "$RUN_DIR"/iter_* "$RUN_DIR"/*/iter_* 2>/dev/null \
    | awk -F'iter_' '{n=$NF; sub(/_.*/,"",n); print n, $0}' \
    | sort -n | tail -1 | cut -d' ' -f2-)
  BEST=$(ls -d "$RUN_DIR"/*best_model* "$RUN_DIR"/*/*best_model* 2>/dev/null | head -1)
  if [ -n "${NEWEST:-}" ]; then
    tar -czf bench_results/r05_ckpt_latest.tar.gz -C "$RUN_DIR" \
      $(realpath --relative-to="$RUN_DIR" "$NEWEST") \
      ${BEST:+$(realpath --relative-to="$RUN_DIR" "$BEST")} 2>>"$LOG"
    SZ=$(stat -c %s bench_results/r05_ckpt_latest.tar.gz 2>/dev/null || echo 0)
    if [ "$SZ" -le 350000000 ]; then
      git add -f bench_results/r05_ckpt_latest.tar.gz
      commit_artifacts "Checkpoint insurance: canonical 20k final ($(basename "$NEWEST"))"
    else
      say "final insurance tar too large (${SZ} B) — disk only"
    fi
  fi
fi

# ---- 4. repo bench.py (validate + warm the driver's path) -----------------
now=$(date +%s)
if [ $(( TAIL_END - now )) -gt 600 ]; then
  say "repo bench.py (validate round-5 inference path, warm driver cache)"
  python bench.py >bench_results/r05_bench_final.json 2>"$WORK/bench_tail.err"
  rc=$?
  say "bench rc=$rc: $(cat bench_results/r05_bench_final.json 2>/dev/null)"
  [ $rc -ne 0 ] && cp "$WORK/bench_tail.err" bench_results/r05_bench_final.err 2>/dev/null
  refresh_tail_log
  commit_artifacts "Round-5 final bench validation (repo bench.py on the v5e)"
else
  say "skip bench (insufficient budget)"
fi

# ---- 5. BraTS19 endurance slice -------------------------------------------
now=$(date +%s)
if [ $(( TAIL_END - now )) -gt 1500 ]; then
  say "BraTS19 canonical-geometry endurance slice (deadline $(date -d @$((TAIL_END - 60))))"
  bash scripts/exp_brats19_endurance.sh $(( TAIL_END - 60 )) >>"$WORK/brats_tail.log" 2>&1
  say "BraTS endurance rc=$?"
  refresh_tail_log
  commit_artifacts "BraTS19 canonical-geometry endurance slice (SIGKILL + resume-in-anger)"
else
  say "skip BraTS endurance (insufficient budget)"
fi

# ---- 6. summary ------------------------------------------------------------
python scripts/summarize_canon20k.py \
  --chain bench_results/r05_night_chain_v4.log \
  >bench_results/r05_canon20k_summary.txt 2>&1 || true
refresh_tail_log
commit_artifacts "Round-5 tail final: canonical 20k summary"
say "TAIL DONE — TPU free"
touch "$WORK/tail.done"
