"""Sharding-aware checkpointing of the full training state via orbax.

Replaces the reference's two mechanisms (SURVEY.md §5): entry-point level
``torch.save(state_dict)`` (train_decoder.py:177-184) and trainer-level
``VideoDecoderTrainer.save/load`` bundles (trainer.py:158-235: model,
per-unet optimizer/scheduler state, per-unet step counters, EMA weights,
version stamp with mismatch warning).
"""

from __future__ import annotations

import logging
import signal
import threading
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


class RollingCheckpointManager:
    """Async, step-indexed checkpointing with retention + best-K tracking
    (ROADMAP #10; beyond the reference's torch.save last/best pair,
    /root/reference/train_decoder.py:177-184).

    * saves run in the background (orbax async) — the train loop is not
      blocked on HBM->disk serialization
    * keeps the newest ``max_to_keep`` step checkpoints
    * additionally keeps the ``best_k`` checkpoints by a metric (min mode)
    * ``keep_period``: every keep_period-th step is retained PERMANENTLY
      (a second retention class for long production runs — archival
      snapshots survive the newest-K window)
    """

    def __init__(
        self,
        directory: str,
        *,
        max_to_keep: int = 3,
        best_k: int = 1,
        metric_key: str = "val_loss",
        keep_period: Optional[int] = None,
    ):
        self._dir = Path(directory).absolute()
        self._dir.mkdir(parents=True, exist_ok=True)
        # recency retention lives in orbax (max_to_keep newest); best-K is
        # managed here in a separate subdirectory — orbax's best_fn mode
        # would evict the NEWEST step when it isn't among the best, which
        # breaks crash-resume (learned from its retention semantics).
        self._mgr = ocp.CheckpointManager(
            self._dir / "recent",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, enable_async_checkpointing=True,
                keep_period=keep_period,
            ),
        )
        self._best_mgr = ocp.CheckpointManager(
            self._dir / "best",
            options=ocp.CheckpointManagerOptions(
                max_to_keep=best_k, best_fn=lambda m: m[metric_key],
                best_mode="min", enable_async_checkpointing=True,
            ),
        ) if best_k else None
        self._best_k = best_k
        self._metric_key = metric_key
        # stamp the WRITER's version once; never overwrite an existing
        # stamp (read-only helpers construct managers too — clobbering
        # would destroy the recorded writer version and make mismatch
        # detection impossible)
        vfile = self._dir / _VERSION_KEY
        if vfile.exists():
            recorded = vfile.read_text().strip()
            if recorded != __version__:
                import logging

                logging.getLogger(__name__).warning(
                    "checkpoint dir %s was written by framework version %s "
                    "(current: %s)", self._dir, recorded, __version__,
                )
        else:
            vfile.write_text(__version__)

    @property
    def directory(self) -> Path:
        return self._dir

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if self._best_mgr is not None and metrics and self._metric_key in metrics:
            # materialize a best/ copy whenever this step belongs in the kept
            # set: the gate compares against the WORST kept metric (not the
            # best — that starved slots 2..k for best_k > 1); orbax's
            # best_fn/max_to_keep retention then evicts the displaced one
            kept = self._kept_metrics()
            worst = max(kept) if len(kept) >= self._best_k else None
            if worst is None or metrics[self._metric_key] < worst:
                self._best_mgr.save(
                    step, args=ocp.args.StandardSave(state), metrics=metrics
                )

    def _kept_metrics(self) -> list:
        """Metric values of every checkpoint currently kept in best/."""
        vals = []
        for s in self._best_mgr.all_steps():
            try:
                m = self._best_mgr.metrics(s)
            except Exception:  # noqa: BLE001 — metrics sidecar missing
                m = None
            if m is not None and self._metric_key in m:
                vals.append(m[self._metric_key])
        return vals

    @staticmethod
    def _restore(mgr, step: int, target: Any) -> Any:
        """StandardRestore, topology-portable for structure-free loads.

        With target=None orbax restores onto the checkpoint's SAVED device
        layout — a state saved sharded over a mesh (pipelined/EP prior,
        multi-chip training) then refuses to load on a different topology
        (single-chip sampler/server). Fall back to a template built from
        the checkpoint's own metadata with every array placed whole on the
        local default device."""
        if target is not None:
            return mgr.restore(step, args=ocp.args.StandardRestore(target))
        try:
            return mgr.restore(step, args=ocp.args.StandardRestore(target))
        except ValueError:
            sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])
            template = jax.tree_util.tree_map(
                lambda m: jax.ShapeDtypeStruct(
                    tuple(m.shape), m.dtype, sharding=sharding
                ),
                mgr.item_metadata(step),
            )
            return mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_latest(self, target: Any) -> Any:
        step = self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self._dir}")
        return self._restore(self._mgr, step, target)

    def restore_best(self, target: Any) -> Any:
        step = self._best_mgr.best_step() if self._best_mgr else None
        if step is None:
            return self.restore_latest(target)
        return self._restore(self._best_mgr, step, target)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self):
        return sorted(self._mgr.all_steps())

    def wait(self) -> None:
        self._mgr.wait_until_finished()
        if self._best_mgr is not None:
            self._best_mgr.wait_until_finished()

    def close(self) -> None:
        self.wait()
        self._mgr.close()
        if self._best_mgr is not None:
            self._best_mgr.close()


class PreemptionGuard:
    """Graceful-preemption handling for training loops (ROADMAP infra:
    preemption resilience; SURVEY §5 — the reference has NO failure
    handling, a signal kills the nohup'd run and loses everything since
    the last per-epoch torch.save).

    Signals (SIGTERM by default — what cluster schedulers send before
    evicting a worker) only set a flag: saving inside a signal handler
    while an XLA dispatch is in flight is unsafe, so the *training loop*
    polls ``preempted`` at step boundaries and calls ``emergency_save``,
    which writes a SYNCHRONOUS checkpoint (durable before the process
    exits) plus a ``PREEMPTED`` marker sidecar. On restart, the normal
    ``resume=true`` path restores it — a preempted run loses at most the
    in-flight step instead of the whole epoch.

    Exit code convention: loops exit with 128+SIGTERM (143) after the
    emergency save so supervisors (scripts/run_elastic.py) restart with
    resume appended.
    """

    EXIT_CODE = 128 + signal.SIGTERM

    def __init__(self, signals=(signal.SIGTERM,)):
        self._flag = threading.Event()
        self._received: Optional[int] = None
        self._prev = {}
        for s in signals:
            self._prev[s] = signal.signal(s, self._handle)

    def _handle(self, signum, frame):  # noqa: ARG002 — signal API
        self._received = signum
        self._flag.set()

    @property
    def preempted(self) -> bool:
        return self._flag.is_set()

    def emergency_save(
        self,
        mgr: "RollingCheckpointManager",
        step: int,
        state: Any,
        metrics: Optional[dict] = None,
    ) -> None:
        """Synchronous save + durable-before-return barrier + marker."""
        if mgr.latest_step() != step:
            mgr.save(step, state, metrics=metrics)
        mgr.wait()
        (mgr.directory / "PREEMPTED").write_text(str(step))
        logger.warning(
            "preemption (signal %s): emergency checkpoint at step %d",
            self._received, step,
        )

    def restore_handlers(self) -> None:
        for s, prev in self._prev.items():
            signal.signal(s, prev)


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


# --------------------------------------------------------------------- #
# layout-detecting helpers: scripts accept either the legacy last/best
# single-dir layout or a RollingCheckpointManager directory (recent/, best/)
# --------------------------------------------------------------------- #
def has_checkpoint(path: str) -> bool:
    p = Path(path).absolute()
    if (p / "recent").exists():
        mgr = RollingCheckpointManager(str(p))
        try:
            return mgr.latest_step() is not None
        finally:
            mgr.close()
    return (p / "last").exists() or (p / _VERSION_KEY).exists()


def load_latest(path: str, target: Any) -> Any:
    """Newest state under ``path`` regardless of layout."""
    p = Path(path).absolute()
    if (p / "recent").exists():
        mgr = RollingCheckpointManager(str(p))
        try:
            return mgr.restore_latest(target)
        finally:
            mgr.close()
    if (p / "last").exists():
        return load_checkpoint(str(p / "last"), target)
    return load_checkpoint(str(p), target)


def load_params_subtree(
    path: str, params_template: Any, which: str = "best",
    prefer_ema: bool = True,
) -> Any:
    """Model params from a stage checkpoint dir, layout-agnostic.

    Resumable trainers (train_prior/train_vqgan) save their FULL training
    state ({"params": ..., "opt_state": ...[, "ema": ...]} or a dataclass
    with a params-like field); older runs saved bare params. Inference
    consumers (sample/serve) only need the params — restore structure-free
    and select, then cast into the template's dtypes. When the state
    carries an EMA shadow it is preferred (dalle2-pytorch's trainers
    sample with the EMA model); prefer_ema=False selects the online
    params instead."""
    loader = load_best if which == "best" else load_latest
    raw = loader(path, None)  # orbax StandardRestore without a template
    if isinstance(raw, dict) and "params" in raw and "opt_state" in raw:
        ema = raw.get("ema")
        if prefer_ema and isinstance(ema, dict) and "params" in ema:
            raw = ema["params"]
        else:
            raw = raw["params"]
    return jax.tree_util.tree_map(
        lambda t, a: jax.numpy.asarray(a, getattr(t, "dtype", None)),
        params_template, raw,
    )


def load_best(path: str, target: Any) -> Any:
    """Best-metric state under ``path`` (falls back to newest/legacy)."""
    p = Path(path).absolute()
    if (p / "recent").exists():
        mgr = RollingCheckpointManager(str(p))
        try:
            return mgr.restore_best(target)
        finally:
            mgr.close()
    if (p / "best").exists():
        return load_checkpoint(str(p / "best"), target)
    return load_latest(path, target)
