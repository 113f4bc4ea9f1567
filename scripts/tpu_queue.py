"""Sequential TPU job queue with axon-outage retry, persistent state, and
dynamic job-file re-reading.

The axon backend has outages (CLAUDE.md): jax.devices() can hang or raise
UNAVAILABLE for an hour, then recover. This runner executes a list of
shell commands one at a time; before each job it probes the backend in a
subprocess (bounded by timeout) and waits until the device answers. Jobs
that fail are retried up to --retries times (a mid-run outage kills the
job process; most scripts here are resumable).

Restart-safety (r5, VERDICT #7 — the queue died at a session boundary in
r3 x2 and r4 despite setsid):
- runs/tpu_queue.state.json records {jobs_file, next_index} after every
  job; relaunching the same jobs file RESUMES from next_index (the
  in-flight job at kill time is re-run; job scripts are resumable).
- the jobs file is re-read before every job, so new jobs may be APPENDED
  while the queue runs (never edit lines above the current index).
- runs/tpu_queue.pid holds the queue's pid for scripts/queue_watchdog.sh,
  which relaunches the queue (pid-specific, never pattern-kills) if it
  dies with jobs remaining.

Usage:
    python scripts/tpu_queue.py jobs.txt            # one command per line
    python scripts/tpu_queue.py jobs.txt --fresh    # ignore saved state
    (lines starting with '#' are skipped)

Progress is logged to stdout and runs/tpu_queue.log.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

PROBE = [sys.executable, "-c", "import jax; print(jax.devices())"]
PROBE_TIMEOUT = 240
RETRY_WAIT = 90
STATE = Path("runs/tpu_queue.state.json")


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open("runs/tpu_queue.log", "a") as f:
        f.write(line + "\n")


def wait_for_device() -> None:
    if os.environ.get("TPU_QUEUE_PROBE") == "skip":
        return  # tests: drill queue mechanics without touching a backend
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                PROBE, capture_output=True, timeout=PROBE_TIMEOUT, text=True
            )
            if r.returncode == 0 and "TPU" in r.stdout:
                return
            tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
            log(f"probe {attempt}: backend not ready ({tail}); wait {RETRY_WAIT}s")
        except subprocess.TimeoutExpired:
            log(f"probe {attempt}: hang >{PROBE_TIMEOUT}s (axon outage); "
                f"wait {RETRY_WAIT}s")
        time.sleep(RETRY_WAIT)


def read_jobs(jobs_file: str) -> list:
    return [
        ln.strip()
        for ln in Path(jobs_file).read_text().splitlines()
        if ln.strip() and not ln.strip().startswith("#")
    ]


def save_state(jobs_file: str, next_index: int) -> None:
    STATE.write_text(json.dumps(
        {"jobs_file": jobs_file, "next_index": next_index}))


def main() -> None:
    jobs_file = sys.argv[1]
    fresh = "--fresh" in sys.argv[2:]
    retries = 2
    Path("runs").mkdir(exist_ok=True)
    Path("runs/tpu_queue.pid").write_text(str(os.getpid()))
    stop_file = Path("runs/tpu_queue.STOP")

    start = 0
    if not fresh and STATE.exists():
        st = json.loads(STATE.read_text())
        if st.get("jobs_file") == jobs_file:
            start = int(st.get("next_index", 0))
            if start:
                log(f"resuming {jobs_file} from job index {start} "
                    f"(runs/tpu_queue.state.json)")
    if fresh:
        stop_file.unlink(missing_ok=True)
    save_state(jobs_file, start)

    i = start
    n_known = len(read_jobs(jobs_file))
    log(f"queue start: {n_known} jobs in {jobs_file}, starting at {i}")
    while True:
        jobs = read_jobs(jobs_file)  # re-read: appended jobs are picked up
        if i >= len(jobs):
            break
        if stop_file.exists():
            # Cooperative stop between jobs: lets a session trim a long
            # tail (e.g. a multi-hour retrain) without killing the job in
            # flight — touch runs/tpu_queue.STOP.
            log(f"STOP file present; exiting before job {i + 1}/{len(jobs)}")
            return
        cmd = jobs[i]
        for attempt in range(1, retries + 2):
            wait_for_device()
            log(f"job {i + 1}/{len(jobs)} attempt {attempt}: {cmd}")
            t0 = time.time()
            rc = subprocess.call(cmd, shell=True)
            dt = time.time() - t0
            if rc == 0:
                log(f"job {i + 1} OK in {dt / 60:.1f} min")
                break
            log(f"job {i + 1} FAILED rc={rc} after {dt / 60:.1f} min")
        else:
            log(f"job {i + 1} exhausted retries; continuing with next job")
        i += 1
        save_state(jobs_file, i)
    save_state(jobs_file, i)
    log("queue complete")


if __name__ == "__main__":
    main()
