#!/bin/bash
# DEPRECATED (r5): prefer `touch runs/tpu_queue.STOP` — tpu_queue.py stops
# cooperatively between jobs, and a hard trim would otherwise trip
# queue_watchdog.sh relaunches.
#
# One-shot watcher for an ALREADY-RUNNING tpu_queue: kills the queue's
# process group the moment the given job-start line appears in
# runs/tpu_queue.log, so a long tail (teacher retrain) never contends
# with the driver's end-of-round scored bench. PID-specific by design —
# never kills by pattern. Only lines appended AFTER watcher start are
# matched: the log is append-only across queue runs, so a stale job-start
# line from a PREVIOUS run must not trigger the kill (ADVICE r4).
#   usage: queue_trim_watch.sh <queue_pgid> <log_regex>
set -u
PGID=$1
PAT=$2
START=$(wc -l < runs/tpu_queue.log 2>/dev/null || echo 0)
while true; do
  if ! kill -0 "$PGID" 2>/dev/null; then
    echo "$(date +%H:%M:%S) queue $PGID gone; watcher exits" >> runs/queue_watch.log
    exit 0
  fi
  if tail -n "+$((START + 1))" runs/tpu_queue.log 2>/dev/null | grep -q "$PAT"; then
    touch runs/tpu_queue.STOP   # keep queue_watchdog.sh from relaunching
    kill -TERM -- "-$PGID"
    echo "$(date +%H:%M:%S) matched '$PAT'; killed group $PGID" >> runs/queue_watch.log
    exit 0
  fi
  sleep 10
done
