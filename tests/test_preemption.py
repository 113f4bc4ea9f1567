"""Preemption resilience (ROADMAP infra; SURVEY §5 failure-detection row).

The reference has NO preemption handling: SIGTERM kills the nohup'd run
and loses everything since the last per-epoch torch.save
(/root/reference/train_decoder.py:177-184, README.md:69-75). Here a
SIGTERM'd training loop emergency-saves the live state synchronously and
exits with the 128+15 code the elastic supervisor restarts on.
"""

from __future__ import annotations

import signal
import subprocess
import sys
import textwrap
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent

_CHILD = textwrap.dedent("""
    import sys, time
    sys.path.insert(0, {root!r})

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dalle2_video_tpu.train.checkpoint import (
        PreemptionGuard,
        RollingCheckpointManager,
    )

    guard = PreemptionGuard()
    mgr = RollingCheckpointManager({ckdir!r}, max_to_keep=2, best_k=0)
    state = {{"w": jnp.zeros(4), "step": jnp.zeros((), jnp.int32)}}
    # interval saves every 500 steps; the signal lands far from a multiple
    for step in range(1, 10_000):
        state = {{"w": state["w"] + 1.0,
                  "step": state["step"] + 1}}
        if step % 500 == 0:
            mgr.save(step, state)
        if step == 5:
            print("RUNNING", flush=True)   # parent fires SIGTERM after this
        time.sleep(0.01)
        if guard.preempted:
            guard.emergency_save(mgr, step, state)
            print("EMERGENCY", step, flush=True)
            mgr.close()
            sys.exit(PreemptionGuard.EXIT_CODE)
    sys.exit(0)
""")


def test_sigterm_triggers_emergency_checkpoint(tmp_path):
    ckdir = str(tmp_path / "ckpts")
    child = tmp_path / "child.py"
    child.write_text(_CHILD.format(root=str(ROOT), ckdir=ckdir))

    proc = subprocess.Popen(
        [sys.executable, str(child)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=str(ROOT),
    )
    try:
        # wait for the loop to be live, then preempt it
        line = proc.stdout.readline()
        assert "RUNNING" in line, line
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=120)
    finally:
        if proc.poll() is None:
            proc.kill()

    assert proc.returncode == 128 + signal.SIGTERM, (proc.returncode, out)
    assert "EMERGENCY" in out, out
    saved_step = int(out.split("EMERGENCY")[1].split()[0])
    # the signal landed mid-interval: the emergency save is the only way
    # this step could have been captured
    assert saved_step % 500 != 0, saved_step

    # marker + durable restore of the exact preempted step
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from dalle2_video_tpu.train.checkpoint import RollingCheckpointManager

    assert (Path(ckdir) / "PREEMPTED").read_text() == str(saved_step)
    mgr = RollingCheckpointManager(ckdir, max_to_keep=2, best_k=0)
    try:
        assert mgr.latest_step() == saved_step
        state = mgr.restore_latest(
            {"w": jnp.zeros(4), "step": jnp.zeros((), jnp.int32)})
        assert int(state["step"]) == saved_step
        assert float(state["w"][0]) == float(saved_step)
    finally:
        mgr.close()


def test_guard_flag_only_no_signal():
    """Without a signal the guard is inert and handlers restore cleanly."""
    from dalle2_video_tpu.train.checkpoint import PreemptionGuard

    prev = signal.getsignal(signal.SIGTERM)
    guard = PreemptionGuard()
    assert not guard.preempted
    guard.restore_handlers()
    assert signal.getsignal(signal.SIGTERM) is prev
