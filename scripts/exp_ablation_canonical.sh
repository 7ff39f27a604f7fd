#!/bin/bash
# Canonical-geometry SSL ablation (VERDICT r4 next #3): supervised-only
# vs full DyCON on the HARD synthetic task at the reference's Pancreas
# protocol scale — 62 train / 20 test volumes at (128,128,112), patch
# (112,112,96), batch 8 (4 labeled), labelnum 12, 5000 iterations — for
# 3 seeds (1337/2337/3337, the round-3/4 reproducibility convention).
# This converts the "SSL machinery matters" evidence from toy scale
# (round 4: 64x64x48, labelnum 3/30, 2500 iters) to protocol scale.
# Objective match: /root/reference/code/train_DyCON_Pancreas.py:258.
#
# Legs are ordered pair-complete (seed-major, dycon before sup) so a
# deadline cut still leaves whole seed rows for the table. Each leg is
# ONE python process (relay discipline, CLAUDE.md) bounded by an
# internal --time_budget_s clean exit — never an external timeout kill.
#
# Usage: exp_ablation_canonical.sh <deadline_epoch_s>
#   deadline = wall time by which the TPU must be FREE.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"

DEADLINE="${1:?usage: exp_ablation_canonical.sh <deadline_epoch_s>}"
ROOT=/tmp/hard_canon
WORK=/tmp/abl_canon
mkdir -p "$WORK" bench_results
LOG="$WORK/orchestrator.log"
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

ITERS=5000
# training needs ~0.5 s/iter => ~2500 s; dense eval of 20 vols + (one
# cold compile for the sup arm's u_weight=0 graph) ride on top. A leg
# that hits its budget still clean-exits, checkpoints, and dense-evals
# the best state so far — partial legs produce rows too (marked by
# their metrics.jsonl final iteration).
EVAL_RESERVE=600

for seed in 1337 2337 3337; do
  for arm in dycon sup; do
    stamp="$WORK/s${seed}_${arm}.done"
    [ -e "$stamp" ] && continue
    now=$(date +%s)
    budget=$(( DEADLINE - now - EVAL_RESERVE ))
    if [ "$budget" -lt 1500 ]; then
      say "skip seed=$seed arm=$arm: only ${budget}s of training budget left"
      continue
    fi
    [ "$budget" -gt 3600 ] && budget=3600
    say "leg seed=$seed arm=$arm: iters=$ITERS time_budget_s=$budget"
    python -u scripts/exp_ssl_ablation.py \
      --arms "$arm" --seed "$seed" --iters "$ITERS" \
      --labelnum 12 --batch_size 8 --patch_size 112 112 96 \
      --n_train 62 --n_test 20 --shape 128 128 112 \
      --root "$ROOT" --work "$WORK/seed$seed" \
      --time_budget_s "$budget" \
      >"$WORK/s${seed}_${arm}.log" 2>&1
    rc=$?
    say "leg seed=$seed arm=$arm rc=$rc ($(grep -c 'Iteration' "$WORK/s${seed}_${arm}.log" 2>/dev/null || echo 0) log lines)"
    grep -E '^(\{"arm"|FINAL)' "$WORK/s${seed}_${arm}.log" | tee -a "$LOG"
    [ $rc -eq 0 ] && touch "$stamp"
  done
done

# gather every per-leg JSON line into one artifact for BASELINE.md
{
  echo '{"note": "canonical-geometry hard-task SSL ablation (62/20 at 128x128x112, patch 112x112x96, bs 8, labelnum 12, 5000 iters, seeds 1337/2337/3337; scripts/exp_ablation_canonical.sh)",'
  echo ' "legs": ['
  first=1
  for seed in 1337 2337 3337; do
    for arm in dycon sup; do
      f="$WORK/s${seed}_${arm}.log"
      [ -e "$f" ] || continue
      line=$(grep -E '^\{"arm"' "$f" | tail -1)
      [ -n "$line" ] || continue
      [ $first -eq 0 ] && echo ','
      first=0
      printf '  {"seed": %s, %s' "$seed" "${line#\{}"
    done
  done
  echo ' ]}'
} > bench_results/r05_ablation_canonical.json 2>/dev/null
cp "$LOG" bench_results/r05_ablation_canonical_orchestrator.log 2>/dev/null
say "ABLATION-CANONICAL ORCHESTRATOR DONE"
