#!/bin/bash
# One-shot watcher for an ALREADY-RUNNING tpu_queue (pre-STOP-file code):
# kills the queue's process group the moment the given job-start line
# appears in runs/tpu_queue.log, so a long tail (teacher retrain) never
# contends with the driver's end-of-round scored bench. PID-specific by
# design — never kills by pattern.
#   usage: queue_trim_watch.sh <queue_pgid> <log_regex>
set -u
PGID=$1
PAT=$2
while true; do
  if ! kill -0 "$PGID" 2>/dev/null; then
    echo "$(date +%H:%M:%S) queue $PGID gone; watcher exits" >> runs/queue_watch.log
    exit 0
  fi
  if grep -q "$PAT" runs/tpu_queue.log 2>/dev/null; then
    kill -TERM -- "-$PGID"
    echo "$(date +%H:%M:%S) matched '$PAT'; killed group $PGID" >> runs/queue_watch.log
    exit 0
  fi
  sleep 10
done
