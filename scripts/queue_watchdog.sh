#!/bin/bash
# Self-resuming guard for tpu_queue.py (VERDICT r4 #7: the queue has been
# killed at session boundaries at least three times despite setsid).
#
# Every 60s: if the queue pid (runs/tpu_queue.pid) is dead while the state
# file still has jobs remaining and no STOP file is present, relaunch the
# queue in a NEW session (setsid) on the same jobs file — it resumes from
# runs/tpu_queue.state.json. PID-file based; never kills or greps by
# pattern. Exits when the queue finishes all jobs or STOP is touched.
#
#   usage: setsid nohup scripts/queue_watchdog.sh <jobs_file> \
#            < /dev/null >> runs/queue_watchdog.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
JOBS=$1
echo "$$" > runs/queue_watchdog.pid
note() { echo "$(date +%H:%M:%S) watchdog: $*"; }
note "armed for $JOBS (pid $$)"
while true; do
  sleep 60
  if [ -f runs/tpu_queue.STOP ]; then
    note "STOP file present; watchdog exits"
    exit 0
  fi
  # jobs remaining?
  REMAIN=$(python - "$JOBS" <<'EOF'
import json, sys
from pathlib import Path
jobs_file = sys.argv[1]
try:
    st = json.loads(Path("runs/tpu_queue.state.json").read_text())
    nxt = st["next_index"] if st.get("jobs_file") == jobs_file else 0
except Exception:
    nxt = 0
jobs = [l.strip() for l in Path(jobs_file).read_text().splitlines()
        if l.strip() and not l.strip().startswith("#")]
print(max(0, len(jobs) - nxt))
EOF
)
  if [ "$REMAIN" = "0" ]; then
    note "all jobs done; watchdog exits"
    exit 0
  fi
  PID=$(cat runs/tpu_queue.pid 2>/dev/null || echo 0)
  if [ "$PID" != "0" ] && kill -0 "$PID" 2>/dev/null; then
    continue  # queue alive
  fi
  note "queue pid $PID dead with $REMAIN jobs remaining; relaunching"
  setsid nohup python scripts/tpu_queue.py "$JOBS" \
    < /dev/null >> runs/queue_r5.out 2>&1 &
  sleep 30
done
