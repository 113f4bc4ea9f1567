"""Tracing / profiling — first-class (the reference has none; SURVEY.md §5:
"Rebuild: jax.profiler trace hooks + per-step timing as first-class").

  * ``trace(logdir)``: context manager around ``jax.profiler`` — produces a
    TensorBoard-loadable trace of device + host activity.
  * ``StepTimer``: wall-clock per-step timing with percentile summaries and
    a rolling throughput estimate; near-zero overhead (one perf_counter per
    step, device sync only when asked).
  * ``flops_of(fn, *args)``: XLA's static FLOP estimate for a jitted fn —
    the numerator for MFU accounting (used by bench.py).
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, window: int = 100):
        self.window = window
        self._times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        """Record one step; pass the step output to block on it first."""
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._times.append(dt)
        if len(self._times) > self.window:
            self._times.pop(0)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        out: Dict[str, Any] = {}
        yield out
        self.stop(out.get("result"))

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        a = np.asarray(self._times)
        return {
            "step_time_mean_s": float(a.mean()),
            "step_time_p50_s": float(np.percentile(a, 50)),
            "step_time_p90_s": float(np.percentile(a, 90)),
            "steps_per_sec": float(1.0 / a.mean()),
        }


def flops_of(jitted_fn, *args, **kwargs) -> float:
    """Static XLA FLOP estimate of one invocation (0.0 if unavailable)."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost.get("flops", 0.0)) if cost else 0.0
    except Exception:
        return 0.0


# v5e bf16 ~197 TFLOP/s; see bench.py for the per-device table.
def mfu(flops_per_step: float, step_time_s: float, peak_flops: float) -> float:
    if not flops_per_step or not step_time_s or not peak_flops:
        return 0.0
    return flops_per_step / step_time_s / peak_flops
