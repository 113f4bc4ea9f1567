"""Mirror compact result artifacts from runs/ into evidence/ (VERDICT r3 #2).

runs/ has been erased by machine swaps three times; every quality number
must have a witness IN GIT. This copies the small, human-checkable
artifacts (results.json, metrics JSONLs, logs' final lines, sample-grid
PNGs under a size cap) from runs/ into evidence/runs/, preserving paths.
Large arrays / checkpoints stay out (regenerable from committed scripts +
fixed seeds).

Usage: python scripts/collect_evidence.py   (idempotent; run after each
queue job — scripts/jobs_r4.txt interleaves it)
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

SRC = Path("runs")
DST = Path("evidence/runs")
MAX_PNG = 3 * 2**20  # 3 MB
PATTERNS = ("results.json", "summary.json", "*.jsonl", "*.png", "metrics*.json")


def main() -> None:
    if not SRC.exists():
        print("no runs/ directory; nothing to collect")
        return
    copied = 0
    for pat in PATTERNS:
        for f in SRC.rglob(pat):
            if f.suffix == ".png" and f.stat().st_size > MAX_PNG:
                continue
            rel = f.relative_to(SRC)
            out = DST / rel
            out.parent.mkdir(parents=True, exist_ok=True)
            if out.exists() and out.stat().st_mtime >= f.stat().st_mtime:
                continue
            shutil.copy2(f, out)
            copied += 1
            print(f"  {rel}")
    print(f"collected {copied} artifacts into {DST}")


if __name__ == "__main__":
    main()
    sys.exit(0)
