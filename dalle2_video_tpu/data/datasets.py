"""CelebV-Text dataset + input pipeline.

Rebuild of reference ``CelebVTextDataset``/``CelebVTextCollator``
(/root/reference/dalle2_video/datasets.py): the dataset auto-selects its
stage by which artifact paths are given —
  CLIP    stage: tokenized texts (.npy/.pt) + h5 video store
  prior   stage: text_embeds + video_embeds
  decoder stage: video_embeds + h5 video store
and videos are materialized lazily from the chunked h5 at batch time
(reference collator, datasets.py:23-44) so the full store never sits in RAM.

TPU-first: instead of torch DataLoader+collate, a host-side iterator with
seeded epoch shuffling, per-host sharding (shard_index/num_shards for
multi-host DP), drop-remainder static batch shapes, background prefetch,
and channels-last output ready for `device_put` onto the data axis.
"""

from __future__ import annotations

import logging
import queue
import threading
from pathlib import Path
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

logger = logging.getLogger("dalle2_video_tpu")


def _load_array(path: str) -> np.ndarray:
    """Load .npy or torch .pt tensors (reference artifacts are .pt)."""
    p = Path(path)
    if p.suffix == ".npy":
        return np.load(p)
    if p.suffix == ".npz":
        return next(iter(np.load(p).values()))
    if p.suffix in (".pt", ".pth"):
        import torch

        t = torch.load(p, map_location="cpu", weights_only=True)
        return t.numpy() if hasattr(t, "numpy") else np.asarray(t)
    raise ValueError(f"unsupported array format: {path}")


class CelebVTextDataset:
    """Stage-detecting dataset (reference datasets.py:69-88).

    Video h5 layout follows the reference store: dataset "videos" of shape
    (N, 3, T, S, S) float32 (torch layout, for drop-in compat with data
    preprocessed by the reference); batches come out channels-last.
    """

    def __init__(
        self,
        texts_path: Optional[str] = None,
        videos_path: Optional[str] = None,
        text_embeds_path: Optional[str] = None,
        video_embeds_path: Optional[str] = None,
        h5_dataset_name: str = "videos",
    ):
        self.videos_path = videos_path
        self.h5_dataset_name = h5_dataset_name
        self._h5 = None

        if texts_path is not None and videos_path is not None:
            self.stage = "CLIP"
            self.texts = _load_array(texts_path)
            n = len(self.texts)
        elif text_embeds_path is not None and video_embeds_path is not None:
            self.stage = "prior"
            self.text_embeds = _load_array(text_embeds_path).astype(np.float32)
            self.video_embeds = _load_array(video_embeds_path).astype(np.float32)
            assert len(self.text_embeds) == len(self.video_embeds)
            n = len(self.text_embeds)
        elif video_embeds_path is not None and videos_path is not None:
            self.stage = "decoder"
            self.video_embeds = _load_array(video_embeds_path).astype(np.float32)
            n = len(self.video_embeds)
        else:
            raise ValueError(
                "cannot infer stage: give (texts, videos) for CLIP, "
                "(text_embeds, video_embeds) for prior, or "
                "(video_embeds, videos) for decoder"
            )

        if videos_path is not None:
            if str(videos_path).endswith(".vshard"):
                from dalle2_video_tpu.data.shards import ShardReader

                r = ShardReader(videos_path)
                n_videos = len(r)
                r.close()
            else:
                import h5py

                with h5py.File(videos_path, "r") as f:
                    n_videos = f[self.h5_dataset_name].shape[0]
            n = min(n, n_videos)
        self._len = n
        logger.info("CelebVTextDataset stage=%s size=%d", self.stage, n)

    def __len__(self) -> int:
        return self._len

    def _videos(self):
        """Lazy per-process store handle (h5 or native .vshard)."""
        if self._h5 is None:
            if str(self.videos_path).endswith(".vshard"):
                from dalle2_video_tpu.data.shards import ShardReader

                self._h5 = ShardReader(self.videos_path)
            else:
                import h5py

                self._h5 = h5py.File(self.videos_path, "r")[self.h5_dataset_name]
        return self._h5

    def load_videos(self, indices: np.ndarray) -> np.ndarray:
        """Materialize (b, T, S, S, 3) float32 channels-last from the store
        (reference collator read, datasets.py:33-44)."""
        ds = self._videos()
        if hasattr(ds, "gather"):  # native shard reader: threaded gather
            vids = ds.gather(indices)
        else:
            order = np.argsort(indices)  # h5 fancy indexing requires sorted
            sorted_idx = indices[order]
            vids = ds[sorted_idx.tolist()]  # (b, 3, T, S, S)
            unsort = np.empty_like(order)
            unsort[order] = np.arange(len(order))
            vids = vids[unsort]
        return np.ascontiguousarray(np.transpose(vids, (0, 2, 3, 4, 1)))

    def batch_items(self, indices: np.ndarray) -> Dict[str, np.ndarray]:
        if self.stage == "CLIP":
            return {
                "texts": self.texts[indices],
                "videos": self.load_videos(indices),
            }
        if self.stage == "prior":
            return {
                "text_embeds": self.text_embeds[indices],
                "video_embeds": self.video_embeds[indices],
            }
        return {
            "video_embeds": self.video_embeds[indices],
            "videos": self.load_videos(indices),
        }


def split_indices(
    n: int, train_ratio: float = 0.8, seed: int = 1234
) -> Dict[str, np.ndarray]:
    """Seeded split shared across stages (reference train_clip.py:54-56)."""
    rng = np.random.RandomState(seed)
    perm = rng.permutation(n)
    n_train = int(n * train_ratio)
    return {"train": perm[:n_train], "val": perm[n_train:]}


class BatchLoader:
    """Epoch iterator: seeded shuffle, per-host shard, drop-remainder,
    background prefetch thread (the h5 read happens off the step path)."""

    def __init__(
        self,
        dataset: CelebVTextDataset,
        batch_size: int,
        indices: Optional[np.ndarray] = None,
        shuffle: bool = True,
        seed: int = 0,
        shard_index: int = 0,
        num_shards: int = 1,
        prefetch: int = 2,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.indices = (
            np.asarray(indices) if indices is not None else np.arange(len(dataset))
        )
        self.shuffle = shuffle
        self.seed = seed
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.prefetch = prefetch
        self.epoch = 0

    def __len__(self) -> int:
        per_shard = len(self.indices) // self.num_shards
        return per_shard // self.batch_size

    def _epoch_indices(self) -> np.ndarray:
        idx = self.indices
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            idx = idx[rng.permutation(len(idx))]
        # contiguous per-host shard
        per_shard = len(idx) // self.num_shards
        start = self.shard_index * per_shard
        return idx[start : start + per_shard]

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        idx = self._epoch_indices()
        self.epoch += 1
        nb = len(idx) // self.batch_size
        if nb == 0:
            return

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # bounded put that honors `stop`: a plain q.put blocks forever
            # when the consumer abandons iteration early (queue stays full),
            # leaking the thread and ~prefetch decoded batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for b in range(nb):
                    if stop.is_set():
                        return
                    sel = idx[b * self.batch_size : (b + 1) * self.batch_size]
                    if not put(("batch", self.ds.batch_items(sel))):
                        return
                put(("done", None))
            except BaseException as exc:  # noqa: BLE001 — surface to consumer
                # an IO error must FAIL the epoch, not truncate it silently
                put(("error", exc))

        th = threading.Thread(target=worker, daemon=True)
        th.start()
        try:
            while True:
                kind, item = q.get()
                if kind == "done":
                    return
                if kind == "error":
                    raise item
                yield item
        finally:
            stop.set()
