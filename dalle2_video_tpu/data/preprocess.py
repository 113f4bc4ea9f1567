"""Offline CelebV-Text preprocessing: mp4 + caption dirs -> h5 + tokens.

Rebuild of reference ``preprocess.py``: concatenates the six per-video
caption files (details + action/emotion/light-direction/intensity/temp,
reference preprocess.py:18-43, dir names configs/celebv-text.yaml:1-9),
decodes the first ``seq_len*fps`` frames per clip, applies CLIP-style frame
preprocessing (resize shorter side -> center crop -> [0,1] -> normalize,
reference :46-73), appends to a resizable chunked h5 dataset
``(N, 3, T, S, S)`` float32 (:88-114), and tokenizes captions to ``(N, 77)``
(:121-124).

CPU-only by design — never touches the accelerator (SURVEY.md §2c). Decode
uses OpenCV when present, imageio otherwise.
"""

from __future__ import annotations

import dataclasses
import logging
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger("dalle2_video_tpu")

# OpenAI CLIP normalization constants (reference uses clip.load's transform)
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

ADDITIONAL_CAPTION_DIRS = (
    "action_dur",
    "emotion",
    "light_dir",
    "light_intensity",
    "light_color_temp",
)


@dataclasses.dataclass(frozen=True)
class PreprocessConfig:
    texts_root: str
    videos_root: str
    details_dir: str = "face40_details_new"
    additional_dirs: Sequence[str] = ADDITIONAL_CAPTION_DIRS
    out_h5: str = "data/videos/chunked.h5"
    out_tokens: str = "data/texts/tokenized.npy"
    seq_len: int = 5  # seconds (reference yaml:20)
    fps: int = 30
    frame_size: int = 224
    normalize: bool = True  # CLIP mean/std normalization
    limit: Optional[int] = None
    bpe_path: Optional[str] = None


def load_text(name: str, cfg: PreprocessConfig) -> str:
    """Concatenate the 6 caption sources for one clip (reference :18-43)."""
    root = Path(cfg.texts_root)
    parts: List[str] = []
    details = root / cfg.details_dir / f"{name}.txt"
    parts.extend(details.read_text().strip().splitlines())
    for d in cfg.additional_dirs:
        p = root / d / f"{name}.txt"
        if p.exists():
            parts.extend(p.read_text().strip().splitlines())
    return " ".join(s.strip() for s in parts if s.strip())


def _decode_frames_cv2(path: str, num_frames: int) -> Optional[np.ndarray]:
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while len(frames) < num_frames:
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
    cap.release()
    if not frames:
        return None
    return np.stack(frames)


def _decode_frames_imageio(path: str, num_frames: int) -> Optional[np.ndarray]:
    import imageio.v3 as iio

    frames = []
    for i, frame in enumerate(iio.imiter(path)):
        if i >= num_frames:
            break
        frames.append(np.asarray(frame)[..., :3])
    return np.stack(frames) if frames else None


def decode_frames(path: str, num_frames: int) -> Optional[np.ndarray]:
    try:
        return _decode_frames_cv2(path, num_frames)
    except ImportError:
        return _decode_frames_imageio(path, num_frames)


def preprocess_frames(frames: np.ndarray, size: int, normalize: bool) -> np.ndarray:
    """CLIP-style per-frame transform: resize shorter side to ``size``
    (bicubic), center crop, scale to [0,1], normalize (reference :46-73).
    In: (t, h, w, 3) uint8. Out: (3, t, size, size) f32 (h5/torch layout)."""
    import cv2

    t, h, w, _ = frames.shape
    scale = size / min(h, w)
    nh, nw = round(h * scale), round(w * scale)
    out = np.empty((t, size, size, 3), np.float32)
    y0 = (nh - size) // 2
    x0 = (nw - size) // 2
    for i in range(t):
        r = cv2.resize(frames[i], (nw, nh), interpolation=cv2.INTER_CUBIC)
        out[i] = r[y0 : y0 + size, x0 : x0 + size].astype(np.float32) / 255.0
    if normalize:
        out = (out - CLIP_MEAN) / CLIP_STD
    return np.transpose(out, (3, 0, 1, 2))


class _H5Sink:
    def __init__(self, path: Path):
        import h5py

        self._f = h5py.File(path, "w")
        self._dset = None
        self.count = 0

    def append(self, clip: np.ndarray):
        if self._dset is None:
            self._dset = self._f.create_dataset(
                "videos", shape=(0, *clip.shape), maxshape=(None, *clip.shape),
                chunks=(1, *clip.shape), dtype=np.float32,
            )
        self._dset.resize(self.count + 1, axis=0)
        self._dset[self.count] = clip
        self.count += 1

    def close(self):
        self._f.close()


class _ShardSink:
    def __init__(self, path: Path):
        self._path = path
        self._w = None
        self.count = 0

    def append(self, clip: np.ndarray):
        if self._w is None:
            from dalle2_video_tpu.data.shards import ShardWriter

            self._w = ShardWriter(self._path, clip.shape, np.float32)
        self._w.append(clip)
        self.count = self._w.count

    def close(self):
        if self._w is not None:
            self._w.close()


def run(cfg: PreprocessConfig) -> Tuple[int, str, str]:
    """Process the corpus; returns (num_clips, store_path, tokens_path).

    Output store format follows the extension of ``out_h5``: ``.h5`` keeps
    the reference-compatible chunked h5; ``.vshard`` writes the native
    mmap store read by the C++ shard reader."""
    from dalle2_video_tpu.data.tokenizer import get_tokenizer, tokenize

    num_frames = cfg.seq_len * cfg.fps
    details = sorted((Path(cfg.texts_root) / cfg.details_dir).glob("*.txt"))
    if cfg.limit:
        details = details[: cfg.limit]

    out_h5 = Path(cfg.out_h5)
    out_h5.parent.mkdir(parents=True, exist_ok=True)
    out_tokens = Path(cfg.out_tokens)
    out_tokens.parent.mkdir(parents=True, exist_ok=True)

    tok = get_tokenizer(cfg.bpe_path)
    texts: List[str] = []
    count = 0
    sink = _ShardSink(out_h5) if str(out_h5).endswith(".vshard") else _H5Sink(out_h5)
    try:
        for txt_file in details:
            name = txt_file.stem
            video_path = Path(cfg.videos_root) / f"{name}.mp4"
            if not video_path.exists():
                logger.warning("missing video for %s, skipping", name)
                continue
            frames = decode_frames(str(video_path), num_frames)
            if frames is None or len(frames) < num_frames:
                logger.warning("short/broken video %s, skipping", name)
                continue
            clip = preprocess_frames(frames, cfg.frame_size, cfg.normalize)
            sink.append(clip)
            texts.append(load_text(name, cfg))
            count += 1
            if count % 50 == 0:
                logger.info("processed %d clips", count)
    finally:
        sink.close()

    tokens = tokenize(texts, truncate=True, tokenizer=tok)
    np.save(out_tokens, tokens)
    logger.info("wrote %d clips -> %s, tokens -> %s", count, out_h5, out_tokens)
    return count, str(out_h5), str(out_tokens)
