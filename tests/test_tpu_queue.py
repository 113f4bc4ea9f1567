"""Drill the restart-safe TPU job queue (VERDICT r4 #7: the queue died at
session boundaries in r3 x2 and r4; round 5 added state-file resume + a
pid-file watchdog — this test is the deliberate-kill drill that VERDICT
asked for, run against the REAL scripts, no backend needed
(TPU_QUEUE_PROBE=skip)).

Covers: state-file resume after a mid-job SIGKILL, cooperative STOP,
appended-jobs pickup, and the watchdog relaunching a killed queue from
the saved index.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
QUEUE = REPO / "scripts" / "tpu_queue.py"
WATCHDOG = REPO / "scripts" / "queue_watchdog.sh"


def _env():
    env = dict(os.environ, TPU_QUEUE_PROBE="skip")
    # the queue itself never imports jax; keep the drill hermetic anyway
    env.pop("JAX_PLATFORMS", None)
    return env


def _spawn(jobs_file: str, cwd: Path, *extra: str) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, str(QUEUE), jobs_file, *extra],
        cwd=cwd, env=_env(),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )


def _wait_for(pred, timeout=30.0, msg="condition"):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return
        time.sleep(0.1)
    raise AssertionError(f"timed out waiting for {msg}")


def test_resume_after_kill(tmp_path):
    """Kill the queue mid-chain; a relaunch resumes from the state file
    (the in-flight job re-runs, completed jobs do not)."""
    out = tmp_path / "out.txt"
    jobs = tmp_path / "jobs.txt"
    slow = tmp_path / "slow"
    jobs.write_text(
        f"echo a >> {out}\n"
        # job 2 blocks until we kill the queue (simulated session reap)
        f"echo b >> {out} && while [ ! -f {slow} ]; do sleep 0.1; done\n"
        f"echo c >> {out}\n"
    )
    p = _spawn(str(jobs), tmp_path)
    _wait_for(lambda: out.exists() and "b" in out.read_text(), msg="job 2 start")
    p.send_signal(signal.SIGKILL)  # deliberate parent-kill drill
    p.wait()
    st = json.loads((tmp_path / "runs/tpu_queue.state.json").read_text())
    assert st["next_index"] == 1  # job 1 done, job 2 was in flight
    slow.touch()  # let job 2 finish instantly on the re-run
    p2 = _spawn(str(jobs), tmp_path)
    assert p2.wait(timeout=30) == 0
    # a = exactly once (not re-run); b twice (in-flight re-run); c once
    lines = out.read_text().split()
    assert lines == ["a", "b", "b", "c"], lines
    st = json.loads((tmp_path / "runs/tpu_queue.state.json").read_text())
    assert st["next_index"] == 3


def test_stop_file_and_append_pickup(tmp_path):
    """STOP halts between jobs; appended jobs are picked up on relaunch."""
    out = tmp_path / "out.txt"
    jobs = tmp_path / "jobs.txt"
    jobs.write_text(f"echo a >> {out}\ntouch runs/tpu_queue.STOP\necho b >> {out}\n")
    p = _spawn(str(jobs), tmp_path)
    assert p.wait(timeout=30) == 0
    assert out.read_text().split() == ["a"]  # stopped before job 3
    with jobs.open("a") as f:
        f.write(f"echo d >> {out}\n")  # append while "down"
    (tmp_path / "runs/tpu_queue.STOP").unlink()
    p2 = _spawn(str(jobs), tmp_path)
    assert p2.wait(timeout=30) == 0
    assert out.read_text().split() == ["a", "b", "d"]


def test_watchdog_relaunches_dead_queue(tmp_path):
    """The watchdog sees a dead pid with jobs remaining and relaunches the
    queue, which resumes from the saved index (the r3/r4 failure mode)."""
    out = tmp_path / "out.txt"
    jobs = tmp_path / "jobs.txt"
    slow = tmp_path / "slow"
    jobpid = tmp_path / "jobpid"
    # job 2 records its own pid FIRST, then blocks, then echoes — so the
    # drill can kill the orphaned shell (SIGKILLing the queue does not
    # kill its in-flight subprocess.call child) before arming the
    # watchdog, keeping the output deterministic.
    jobs.write_text(
        f"echo a >> {out}\n"
        f"echo $$ > {jobpid}; while [ ! -f {slow} ]; do sleep 0.1; done; "
        f"echo b >> {out}\n"
    )
    # patched copy: 1s poll instead of 60s, absolute queue path (never
    # edit the live script — bash re-reads running scripts from disk)
    wd = tmp_path / "watchdog.sh"
    src = WATCHDOG.read_text().replace("sleep 60", "sleep 1").replace(
        "sleep 30", "sleep 1")
    src = src.replace('cd "$(dirname "$0")/.."', f'cd {tmp_path}')
    src = src.replace("python scripts/tpu_queue.py", f"python {QUEUE}")
    wd.write_text(src)
    wd.chmod(0o755)
    (tmp_path / "runs").mkdir()

    p = _spawn(str(jobs), tmp_path)
    _wait_for(lambda: jobpid.exists(), msg="job 2 start")
    p.send_signal(signal.SIGKILL)  # the session reap
    p.wait()
    os.kill(int(jobpid.read_text()), signal.SIGKILL)  # orphaned job shell
    slow.touch()  # re-run of job 2 will finish instantly
    w = subprocess.Popen(["/bin/bash", str(wd), str(jobs)], cwd=tmp_path,
                         env=_env(), stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    try:
        # watchdog must relaunch; queue finishes job 2 and records index 2
        _wait_for(
            lambda: (tmp_path / "runs/tpu_queue.state.json").exists()
            and json.loads((tmp_path / "runs/tpu_queue.state.json")
                           .read_text())["next_index"] == 2,
            timeout=60, msg="watchdog relaunch + queue completion")
        assert out.read_text().split() == ["a", "b"]
    finally:
        (tmp_path / "runs/tpu_queue.STOP").touch()
        try:
            w.wait(timeout=10)
        except subprocess.TimeoutExpired:
            w.kill()
