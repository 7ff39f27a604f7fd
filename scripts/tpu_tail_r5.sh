#!/bin/bash
# Round-5 tail-TPU-time dispatcher. The chain (tpu_night_r5c.sh) hands
# its leftover window to this script (installed in the code snapshot as
# exp_ablation_canonical.sh). Priorities for a ~30-60 min tail:
#   1. BraTS19 canonical-geometry endurance slice with SIGKILL+resume
#      (VERDICT r4 next #5) — fits the window; never run before.
#   2. If (unexpectedly) >40 min still remain, hand the rest to the real
#      canonical SSL ablation legs (resumable seed arms).
# Usage: tpu_tail_r5.sh <deadline_epoch_s>
set -u
SNAP="$(cd "$(dirname "$0")/.." && pwd)"
REPO=/root/repo
DEADLINE="${1:?usage: tpu_tail_r5.sh <deadline_epoch_s>}"

commit_repo() {
  (cd "$REPO" && git add bench_results 2>/dev/null
   if ! git diff --cached --quiet 2>/dev/null; then
     git commit -m "$1" --quiet || { sleep 10; git commit -m "$1" --quiet; }
   fi)
}

bash "$SNAP/scripts/exp_brats19_endurance.sh" "$(( DEADLINE - 60 ))"
cp "$SNAP"/bench_results/r05_brats_endurance_* "$REPO/bench_results/" 2>/dev/null
commit_repo "BraTS19 canonical-geometry endurance slice (SIGKILL + resume-in-anger)"

now=$(date +%s)
if [ $(( DEADLINE - now )) -gt 2400 ] && [ -e "$SNAP/scripts/exp_ablation_canonical_real.sh" ]; then
  bash "$SNAP/scripts/exp_ablation_canonical_real.sh" "$DEADLINE"
  cp /tmp/abl_canon/orchestrator.log "$REPO/bench_results/r05_ablation_canonical_orchestrator.log" 2>/dev/null
  commit_repo "Canonical-geometry SSL ablation legs (tail window)"
fi
