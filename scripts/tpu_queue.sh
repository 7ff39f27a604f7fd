#!/bin/bash
# Serial TPU job queue with the relay-wedge protocol (CLAUDE.md).
#
# Usage:  tpu_queue.sh <jobs.txt> [deadline_epoch_seconds]
#
# jobs.txt: one job per line:   <name> <timeout_seconds> <command ...>
# Blank lines and '#' comments are skipped.
#
# Protocol encoded here (replaces the round-3 tpu_queue{,2..8}.sh one-shots):
#   * ONE TPU process at a time; probe the device once before each job.
#   * Completed-run guard: a job whose /tmp/tpuq/<name>.done marker exists
#     is skipped, so re-running a queue (or two queues sharing an item)
#     never repeats finished work (round-3 advisor finding).
#   * rc=124 (timeout-killed TPU job) is the documented wedge trigger:
#     the queue STOPS launching, holds a >=60-min zero-TPU-process
#     silence window, then resumes with a single patient probe — it
#     never probes immediately after a kill (round-3 advisor finding:
#     short-timeout probes mid-claim perpetuate the wedge).
#   * A failed probe (possible wedge) likewise triggers the silence
#     window instead of an abort, up to the deadline.
set -u
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR="$(pwd)/.jax_cache"
mkdir -p /tmp/tpuq

JOBS="${1:?usage: tpu_queue.sh <jobs.txt> [deadline_epoch]}"
DEADLINE="${2:-$(( $(date +%s) + 8 * 3600 ))}"
LOG=/tmp/tpuq/queue.log

log() { echo "$*" | tee -a "$LOG"; }

probe() {
  # patient single probe: claims may queue behind a stale hold — never
  # kill a waiting probe early (that creates a fresh stale claim)
  timeout 2400 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

silence_window() { # called after a wedge signal; >=60 min, no TPU processes
  local until=$(( $(date +%s) + 3900 ))
  log "WEDGE-PROTOCOL: zero-TPU silence until $(date -d @"$until" +%H:%M:%S)"
  sleep 3900
}

while IFS= read -r line || [ -n "$line" ]; do
  case "$line" in ''|'#'*) continue ;; esac
  name=$(echo "$line" | awk '{print $1}')
  to=$(echo "$line" | awk '{print $2}')
  cmd=$(echo "$line" | cut -d' ' -f3-)
  if [ -e "/tmp/tpuq/${name}.done" ]; then
    log "=== $name: already done, skipping"
    continue
  fi
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    log "DEADLINE reached before $name; stopping queue"
    exit 9
  fi
  log "=== $name ($(date +%H:%M:%S)) ==="
  if ! probe; then
    log "PROBE FAILED before $name — possible wedge"
    silence_window
    if ! probe; then
      log "PROBE FAILED again — giving up this queue run"
      exit 9
    fi
  fi
  timeout "$to" bash -c "$cmd" >"/tmp/tpuq/${name}.log" 2>&1
  rc=$?
  log "  -> rc=$rc ($(date +%H:%M:%S))"
  if [ "$rc" -eq 0 ]; then
    touch "/tmp/tpuq/${name}.done"
  elif [ "$rc" -eq 124 ]; then
    # a timeout-killed TPU job is the documented wedge trigger: do NOT
    # probe or launch anything for >=60 min
    log "  rc=124 (timeout kill) — wedge trigger; observing silence window"
    silence_window
  fi
done < "$JOBS"
log "QUEUE DONE $(date +%H:%M:%S)"
