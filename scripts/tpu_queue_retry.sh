#!/bin/bash
# Retry wrapper for tpu_queue.sh during a relay wedge: run the queue;
# if its leading probe fails (exit 9), hold a ~45 min complete-silence
# window (the wedge protocol in CLAUDE.md) and try again, up to a
# deadline. One TPU process at a time throughout (the queue is serial
# and this loop is serial).
#
# Usage: tpu_queue_retry.sh [deadline_epoch_seconds]
set -u
cd "$(dirname "$0")"
DEADLINE="${1:-$(( $(date +%s) + 6 * 3600 ))}"

while :; do
  bash ./tpu_queue.sh
  rc=$?
  if [ "$rc" -ne 9 ]; then
    echo "RETRY-WRAPPER: queue finished rc=$rc $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
    exit "$rc"
  fi
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    echo "RETRY-WRAPPER: deadline reached, giving up $(date +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
    exit 9
  fi
  echo "RETRY-WRAPPER: wedged; silent until $(date -d @"$(( now + 2700 ))" +%H:%M:%S)" | tee -a /tmp/tpuq/queue.log
  sleep 2700
done
