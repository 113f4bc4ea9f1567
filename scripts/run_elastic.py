"""Elastic recovery supervisor: auto-restart a training script on crash or
hang (ROADMAP #11; SURVEY §5 records the reference has NO failure
detection — a crash kills the nohup'd run, recovery is manual restart).

Wraps any entry point in scripts/ with:
  * crash restart with exponential backoff (up to --max-restarts)
  * hang detection via a heartbeat file the MetricsLogger already writes
    (the run's metrics JSONL) — if it goes stale for --hang-secs the child
    is killed (by exact PID, never by pattern) and restarted
  * resume=true is appended on every restart so the script restores its
    latest checkpoint

Usage:
    python scripts/run_elastic.py --hang-secs 1800 -- \
        python scripts/train_decoder.py train_name=prod resume=true
"""

from __future__ import annotations

import argparse
import glob
import os
import signal
import subprocess
import sys
import time


def newest_mtime(patterns) -> float:
    newest = 0.0
    for pat in patterns:
        for f in glob.glob(pat, recursive=True):
            try:
                newest = max(newest, os.path.getmtime(f))
            except OSError:
                pass
    return newest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-restarts", type=int, default=10)
    ap.add_argument("--hang-secs", type=float, default=3600.0,
                    help="restart if no metrics-file progress for this long "
                         "(first compile can take 20+ min on TPU — keep high)")
    ap.add_argument("--watch", default=None,
                    help="glob of heartbeat files (metrics JSONL). Default: "
                         "derived from the supervised command's run_dir/"
                         "train_name overrides so a concurrently active "
                         "sibling run can't mask a hang in THIS child; "
                         "falls back to runs/**/*.jsonl if underivable")
    ap.add_argument("--backoff", type=float, default=10.0)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the training command")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no command given (use: run_elastic.py [opts] -- python ...)")

    if args.watch is None:
        # per-run heartbeat: MetricsLogger writes
        # {run_dir}/{stage}_{train_name}.metrics.jsonl plus a
        # {stage}_{train_name}.heartbeat touched every few seconds of
        # training (batch granularity — the JSONL alone is epoch-mean and
        # goes stale mid-epoch on long epochs). Watch only THIS run's
        # files (ADVICE r2: a global glob let any concurrent run mask a
        # hang here). run_dir/train_name come from CLI overrides first,
        # then the command's YAML config (if any), then defaults.
        overrides = dict(a.split("=", 1) for a in cmd if "=" in a and
                         not a.startswith("-"))
        run_dir, train_name = overrides.get("run_dir"), overrides.get("train_name")
        yaml_args = [a for a in cmd if a.endswith((".yaml", ".yml"))]
        if (run_dir is None or train_name is None):
            try:
                sys.path.insert(0, os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))))
                from dalle2_video_tpu.utils.config import load_config

                ycfg = load_config(yaml_args[0] if yaml_args
                                   else "configs/celebv_text.yaml")
                run_dir = run_dir or ycfg.get("run_dir")
                train_name = train_name or ycfg.get("train_name")
            except Exception as e:  # noqa: BLE001 — best-effort derivation
                print(f"[elastic] could not read config for watch glob: {e}",
                      flush=True)
        run_dir = run_dir or "runs"
        if train_name:
            args.watch = f"{run_dir}/*{train_name}*"
        else:
            args.watch = f"{run_dir}/**/*.jsonl"
            print(f"[elastic] WARNING: no train_name found; "
                  f"watching {args.watch} — concurrent runs in the same "
                  f"run_dir can mask a hang (pass --watch to pin)",
                  flush=True)
    print(f"[elastic] heartbeat glob: {args.watch}", flush=True)

    restarts = 0
    while True:
        start = time.time()
        print(f"[elastic] launch attempt {restarts + 1}: {' '.join(cmd)}",
              flush=True)
        child = subprocess.Popen(cmd)
        hung = False
        while child.poll() is None:
            time.sleep(30.0)
            beat = max(newest_mtime([args.watch]), start)
            if time.time() - beat > args.hang_secs:
                print(f"[elastic] heartbeat stale >{args.hang_secs}s — "
                      f"killing pid {child.pid}", flush=True)
                child.send_signal(signal.SIGTERM)
                try:
                    child.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    child.kill()
                    child.wait()  # reap: no zombie, real returncode
                hung = True
                break
        rc = child.returncode
        if rc == 0 and not hung:
            print("[elastic] run completed cleanly", flush=True)
            return 0
        restarts += 1
        if restarts > args.max_restarts:
            print(f"[elastic] giving up after {args.max_restarts} restarts",
                  flush=True)
            return rc or 1
        wait = min(args.backoff * (2 ** (restarts - 1)), 600.0)
        print(f"[elastic] child exited rc={rc} hung={hung}; restarting in "
              f"{wait:.0f}s (resume=true)", flush=True)
        if "resume=true" not in cmd:
            cmd = cmd + ["resume=true"]
        time.sleep(wait)


if __name__ == "__main__":
    sys.exit(main())
