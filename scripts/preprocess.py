"""Preprocess CelebV-Text: mp4 + captions -> chunked h5 + tokenized texts.

Rebuild of reference ``preprocess.py`` CLI. Usage:

    python scripts/preprocess.py [configs/celebv_text.yaml] [key=value ...]
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from dalle2_video_tpu.data.preprocess import PreprocessConfig, run
    from dalle2_video_tpu.utils import config_from_argv

    cfg = config_from_argv("configs/celebv_text.yaml")
    logging.basicConfig(level=cfg.get("log_level", "INFO"))

    pc = PreprocessConfig(
        texts_root=cfg["texts"]["root"],
        videos_root=cfg["videos"]["root"],
        details_dir=cfg["texts"].get("details_dir", "face40_details_new"),
        out_h5=cfg["videos"]["preprocessed"],
        out_tokens=cfg["texts"]["tokenized"],
        seq_len=cfg["seq_len"],
        fps=cfg["fps"],
        frame_size=cfg["frame_size"],
        limit=cfg.get("limit"),
        bpe_path=cfg.get("bpe_path"),
    )
    count, h5_path, tok_path = run(pc)
    print(f"preprocessed {count} clips -> {h5_path}, tokens -> {tok_path}")


if __name__ == "__main__":
    main()
