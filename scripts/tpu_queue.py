"""Sequential TPU job queue with axon-outage retry.

The axon backend has outages (CLAUDE.md): jax.devices() can hang or raise
UNAVAILABLE for an hour, then recover. This runner executes a list of
shell commands one at a time; before each job it probes the backend in a
subprocess (bounded by timeout) and waits until the device answers. Jobs
that fail are retried up to --retries times (a mid-run outage kills the
job process; most scripts here are resumable).

Usage:
    python scripts/tpu_queue.py jobs.txt            # one command per line
    (lines starting with '#' are skipped)

Progress is logged to stdout and runs/tpu_queue.log.
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

PROBE = [sys.executable, "-c", "import jax; print(jax.devices())"]
PROBE_TIMEOUT = 240
RETRY_WAIT = 90


def log(msg: str) -> None:
    line = f"[{time.strftime('%H:%M:%S')}] {msg}"
    print(line, flush=True)
    with open("runs/tpu_queue.log", "a") as f:
        f.write(line + "\n")


def wait_for_device() -> None:
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


def main() -> None:
    jobs_file = sys.argv[1]
    retries = 2
    jobs = [
        ln.strip()
        for ln in Path(jobs_file).read_text().splitlines()
        if ln.strip() and not ln.strip().startswith("#")
    ]
    Path("runs").mkdir(exist_ok=True)
    stop_file = Path("runs/tpu_queue.STOP")
    stop_file.unlink(missing_ok=True)
    log(f"queue start: {len(jobs)} jobs from {jobs_file}")
    for i, cmd in enumerate(jobs):
        if stop_file.exists():
            # Cooperative stop between jobs: lets a session trim a long
            # tail (e.g. a multi-hour retrain) without killing the job in
            # flight — touch runs/tpu_queue.STOP.
            log(f"STOP file present; exiting before job {i + 1}/{len(jobs)}")
            return
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
    log("queue complete")


if __name__ == "__main__":
    main()
