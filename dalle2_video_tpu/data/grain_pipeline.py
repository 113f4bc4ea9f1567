"""Grain input pipeline — the production loader (SURVEY.md §2c data row:
"tf.data/Grain-style input pipeline ... with per-host sharding and
prefetch").

Wraps the stage-detecting CelebVTextDataset as a grain RandomAccessDataSource
and builds a grain.DataLoader with worker processes, seeded global shuffle,
per-host sharding, drop-remainder batching, and read-ahead prefetch — the
multi-worker replacement for the reference's num_workers=1 h5py DataLoader
(configs/celebv-text.yaml:48). The lighter thread-prefetch BatchLoader
(data/datasets.py) remains for tests/smoke.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from dalle2_video_tpu.data.datasets import CelebVTextDataset


class _Source:
    """grain RandomAccessDataSource over one CelebVTextDataset item."""

    def __init__(self, dataset: CelebVTextDataset, indices: Optional[np.ndarray] = None):
        self._ds = dataset
        self._indices = (
            np.asarray(indices) if indices is not None else np.arange(len(dataset))
        )

    def __len__(self) -> int:
        return len(self._indices)

    def __getitem__(self, i) -> Dict[str, np.ndarray]:
        # one record per call: grain parallelizes IO across WORKER
        # PROCESSES, not via batched reads — the C++ ShardReader's batched
        # mmap gather (shards.py) is only exercised by BatchLoader, which
        # remains the fastest single-process path; this source trades that
        # for grain's process isolation + determinism
        batch = self._ds.batch_items(np.asarray([self._indices[int(i)]]))
        return {k: v[0] for k, v in batch.items()}


def make_grain_loader(
    dataset: CelebVTextDataset,
    batch_size: int,
    indices: Optional[np.ndarray] = None,
    *,
    shuffle: bool = True,
    seed: int = 0,
    num_epochs: Optional[int] = None,
    shard_index: int = 0,
    num_shards: int = 1,
    worker_count: int = 4,
    read_buffer: int = 2,
):
    """Build a grain.DataLoader yielding dict batches (drop remainder).

    worker_count > 0 moves the h5/.vshard reads into subprocesses so the
    training step never waits on host IO.
    """
    import grain.python as gp

    source = _Source(dataset, indices)
    sampler = gp.IndexSampler(
        num_records=len(source),
        shuffle=shuffle,
        seed=seed,
        num_epochs=num_epochs,
        shard_options=gp.ShardOptions(
            shard_index=shard_index, shard_count=num_shards, drop_remainder=True
        ),
    )
    return gp.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[gp.Batch(batch_size=batch_size, drop_remainder=True)],
        worker_count=worker_count,
        read_options=gp.ReadOptions(prefetch_buffer_size=read_buffer),
    )
