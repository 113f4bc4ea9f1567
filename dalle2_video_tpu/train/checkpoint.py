"""Sharding-aware checkpointing of the full training state via orbax.

Replaces the reference's two mechanisms (SURVEY.md §5): entry-point level
``torch.save(state_dict)`` (train_decoder.py:177-184) and trainer-level
``VideoDecoderTrainer.save/load`` bundles (trainer.py:158-235: model,
per-unet optimizer/scheduler state, per-unet step counters, EMA weights,
version stamp with mismatch warning).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from dalle2_video_tpu import __version__

logger = logging.getLogger("dalle2_video_tpu")

_VERSION_KEY = "framework_version"


def save_checkpoint(path: str, state: Any, *, step: Optional[int] = None, overwrite: bool = True) -> None:
    """Save a (possibly sharded) pytree train state + version stamp."""
    path = Path(path).absolute()
    if path.exists() and overwrite:
        import shutil

        shutil.rmtree(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    # orbax arrays-only: version stamp lives in a sidecar file
    (path / _VERSION_KEY).write_text(__version__)


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure/shardings of ``target`` (an abstract or
    concrete state pytree). Warns on version mismatch (reference
    trainer.py:203-207)."""
    path = Path(path).absolute()
    version_file = path / _VERSION_KEY
    if version_file.exists() and version_file.read_text() != __version__:
        logger.warning(
            "loading checkpoint written by version %s; current version is %s",
            version_file.read_text(),
            __version__,
        )
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target)
