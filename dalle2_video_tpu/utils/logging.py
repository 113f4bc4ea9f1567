"""Metrics logging: stdout + JSONL file + optional wandb.

Replaces the reference's wandb-or-nothing logging (train_clip.py:26-33,
179-191; train_decoder.py:30-40,165-175) with an always-on JSONL metrics
stream (the artifact for regression tracking) and optional wandb when the
package + env are present.
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional

logger = logging.getLogger("dalle2_video_tpu")


class MetricsLogger:
    def __init__(self, run_dir: str, run_name: str, use_wandb: bool = False,
                 config: Optional[Dict[str, Any]] = None):
        self.dir = Path(run_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.path = self.dir / f"{run_name}.metrics.jsonl"
        self._f = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project="dalle2-video-tpu", name=run_name,
                                         config=config or {})
            except Exception as e:  # wandb missing or offline
                logger.warning("wandb unavailable (%s); JSONL only", e)
        if config:
            (self.dir / f"{run_name}.config.json").write_text(
                json.dumps(config, indent=2, default=str)
            )

    def heartbeat(self) -> None:
        """Touch a sidecar file at batch granularity so supervisors
        (scripts/run_elastic.py) can detect hangs mid-epoch — the metrics
        JSONL itself is written only once per epoch, which made healthy
        long epochs look stale. Rate-limited to one touch per 5 s (a pure
        host-side utime; never syncs the device)."""
        now = time.time()
        if now - getattr(self, "_hb_time", 0.0) < 5.0:
            return
        self._hb_time = now
        (self.dir / f"{self.path.stem.replace('.metrics', '')}.heartbeat").touch()

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        rec = {"time": time.time(), **({"step": step} if step is not None else {})}
        rec.update({k: float(v) if hasattr(v, "item") or hasattr(v, "astype") else v
                    for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
        msg = " ".join(
            f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
            for k, v in rec.items() if k != "time"
        )
        logger.info(msg)

    def close(self):
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()
