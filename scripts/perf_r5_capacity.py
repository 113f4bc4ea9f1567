"""Round-5: close the flagship B=24/32 capacity question with measured
rows (VERDICT r4 #5 — the r4 sweep's conv_b32 died on a remote-compile
HTTP 500 and PERF.md closed it with arithmetic, not data).

One (policy, batch) variant per process (queue job) via the r4 sweep's
own run_variant, appending to the SAME ledger
(evidence/perf_r4/remat_sweep.jsonl) so rows are directly comparable to
the B=16 six-policy sweep.

Exit codes: 0 = row recorded (including a genuine OOM, which IS the
measurement); 1 = transient infrastructure failure (the queue retries).

Usage: python scripts/perf_r5_capacity.py <policy|none> <batch>
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from perf_r4_remat_sweep import record, run_variant

    pol_arg, batch = sys.argv[1], int(sys.argv[2])
    policy = None if pol_arg in ("none", "base") else pol_arg
    name = f"{pol_arg}_b{batch}"
    try:
        run_variant(name, policy, batch=batch)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        record(name=name, error=msg[:300])
        traceback.print_exc()
        if "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg.lower():
            return  # genuine OOM: the row is the answer, don't retry
        raise SystemExit(1)


if __name__ == "__main__":
    main()
