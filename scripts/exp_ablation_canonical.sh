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
# deadline cut still leaves whole seed rows for the table. Each training
# attempt is ONE fresh python process (relay discipline, CLAUDE.md)
# bounded by an internal --time_budget_s AND the host-RSS watchdog
# (config.host_rss_exit_gb — the relay plugin leaks ~29 MB of H2D
# staging per step, so a 5000-iter arm cannot finish in one process);
# attempts loop with --resume auto until the arm reaches 5000 iters,
# then one --test_only process runs the dense eval.
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
EVAL_RESERVE=900

COMMON=(--iters "$ITERS" --labelnum 12 --batch_size 8
        --patch_size 112 112 96 --n_train 62 --n_test 20
        --shape 128 128 112 --root "$ROOT")

for seed in 1337 2337 3337; do
  for arm in dycon sup; do
    stamp="$WORK/s${seed}_${arm}.done"
    [ -e "$stamp" ] && continue
    leglog="$WORK/s${seed}_${arm}.log"
    last_it=$(grep -hoE '"final_iter": [0-9]+' "$leglog" 2>/dev/null | tail -1 | grep -oE '[0-9]+' || echo 0)
    attempt=0
    while [ "${last_it:-0}" -lt "$ITERS" ] && [ "$attempt" -lt 8 ]; do
      now=$(date +%s)
      budget=$(( DEADLINE - now - EVAL_RESERVE ))
      if [ "$budget" -lt 1200 ]; then
        say "seed=$seed arm=$arm: only ${budget}s left — stopping at iter $last_it"
        break
      fi
      # generous cap: the host-RSS watchdog is the OOM guard; if the
      # gc/delete mitigations hold, a whole 5000-iter arm fits one leg
      [ "$budget" -gt 3600 ] && budget=3600
      resume_flags=()
      [ "${last_it:-0}" -gt 0 ] && resume_flags=(--resume auto)
      say "leg seed=$seed arm=$arm attempt=$attempt from iter $last_it (budget ${budget}s)"
      python -u scripts/exp_ssl_ablation.py \
        --arms "$arm" --seed "$seed" --train_only "${resume_flags[@]}" \
        "${COMMON[@]}" --work "$WORK/seed$seed" \
        --time_budget_s "$budget" >>"$leglog" 2>&1
      rc=$?
      last_it=$(grep -hoE '"final_iter": [0-9]+' "$leglog" | tail -1 | grep -oE '[0-9]+' || echo 0)
      say "  attempt=$attempt rc=$rc reached iter $last_it"
      attempt=$(( attempt + 1 ))
    done
    now=$(date +%s)
    if [ "${last_it:-0}" -ge 1 ] && [ $(( DEADLINE - now )) -gt 300 ]; then
      say "dense eval seed=$seed arm=$arm (trained to $last_it)"
      python -u scripts/exp_ssl_ablation.py \
        --arms "$arm" --seed "$seed" --test_only \
        "${COMMON[@]}" --work "$WORK/seed$seed" >>"$leglog" 2>&1
      say "  eval rc=$?"
    fi
    grep -E '^\{"arm"' "$leglog" | tail -2 | tee -a "$LOG"
    [ "${last_it:-0}" -ge "$ITERS" ] && touch "$stamp"
  done
done

# gather every per-leg JSON line into one artifact for BASELINE.md
python3 - <<'EOF'
import glob, json, os, re
legs = []
for f in sorted(glob.glob("/tmp/abl_canon/s*_*.log")):
    m = re.match(r"s(\d+)_(\w+)\.log", os.path.basename(f))
    row = {"seed": int(m.group(1)), "arm": m.group(2)}
    for line in open(f):
        if line.startswith('{"arm"'):
            row.update(json.loads(line))
    legs.append(row)
out = {"note": ("canonical-geometry hard-task SSL ablation (62/20 at "
                "128x128x112, patch 112x112x96, bs 8, labelnum 12, 5000 "
                "iters, seeds 1337/2337/3337; "
                "scripts/exp_ablation_canonical.sh)"),
       "legs": legs}
with open("bench_results/r05_ablation_canonical.json", "w") as fh:
    json.dump(out, fh, indent=1)
print(json.dumps(out))
EOF
cp "$LOG" bench_results/r05_ablation_canonical_orchestrator.log 2>/dev/null
say "ABLATION-CANONICAL ORCHESTRATOR DONE"
