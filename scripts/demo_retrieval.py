"""Retrieval demo: train the CLIP stage on a 32-pair synthetic corpus and
score full-dataset video->text retrieval (the reference's eval metric,
/root/reference/train_clip.py:139-188 Classifier top-k).

Previously this demo was a manual run (README "Retrieval demo" row); this
script makes it reproducible end to end through the REAL CLIs:

    corpus (32 captioned mp4s, per-pair distinct motion + caption)
      -> scripts/preprocess.py  (decode -> .vshard + BPE tokens)
      -> scripts/train_clip.py  (ViViT video tower + frozen text tower)
      -> scripts/eval_clip.py   (full-dataset embedding dump)
      -> retrieval metrics from the dumped embeddings

Writes runs/retrieval_demo/results.json:
  {"n": 32, "top1": ..., "top10": ..., "chance_top1": ..., "chance_top10": ...}

Notes: the text tower is RANDOM (zero-egress env — no OpenAI CLIP weights;
distinct captions still map to distinct embeddings, so the video tower can
learn to match them). Numbers are comparable to chance, not to real-CLIP
runs.

    python scripts/demo_retrieval.py [workdir] [platform=cpu|axon]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

from e2e_smoke import make_corpus, run_stage

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "runs/retrieval_demo"
N_PAIRS = 32


def write_config(work: Path, platform: str) -> Path:
    cfg = f"""
texts:
  root: {work}/texts
  details_dir: face40_details_new
  tokenized: {work}/data/tokens.npy
  embed: {work}/data/text_embeds.npy
videos:
  root: {work}/videos
  preprocessed: {work}/data/videos.vshard
  embed: {work}/data/video_embeds.npy
seq_len: 1
fps: 25
frame_size: 32
dim: 64
channels: 3
train_name: retrieval_demo
train_ratio: 0.75
seed: 0
run_dir: {work}/runs
use_wandb: false
log_level: INFO
platform: {platform}
mesh: {{data: -1, model: 1}}
video_encoder: {{frame_size: 32, patch_size: 8, num_frames: 25, dim: 64,
                 depth: 2, heads: 4, dim_head: 16}}
clip: {{batch_size: 8, lr: 1.0e-3, lr_scheduler: constant,
        lr_multistep_milestones: [0.5], lr_step_gamma: 0.5, epochs: 30,
        init_temperature: 5.0, openai_ckpt: null}}
"""
    path = work / "retrieval_demo.yaml"
    path.write_text(cfg)
    return path


def main() -> None:
    work = Path(sys.argv[1]) if len(sys.argv) > 1 and "=" not in sys.argv[1] \
        else OUT / "work"
    platform = "cpu"
    for a in sys.argv[1:]:
        if a.startswith("platform="):
            platform = a.split("=", 1)[1]
    OUT.mkdir(parents=True, exist_ok=True)
    if not (work / "videos").exists():
        work.mkdir(parents=True, exist_ok=True)
        make_corpus(work, n=N_PAIRS, frames=25, size=48)
    cfg_path = write_config(work, platform)

    t0 = time.time()
    run_stage("preprocess", "preprocess.py", cfg_path)
    run_stage("train_clip", "train_clip.py", cfg_path)
    run_stage("eval_clip", "eval_clip.py", cfg_path)

    v = np.load(work / "data/video_embeds.npy")
    t = np.load(work / "data/text_embeds.npy")
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    t = t / np.linalg.norm(t, axis=-1, keepdims=True)
    n = len(v)
    sim = v @ t.T
    own = np.diag(sim)
    rank = (sim >= own[:, None]).sum(axis=1)
    res = {
        "n": n,
        "top1": float((rank <= 1).mean()),
        "top10": float((rank <= 10).mean()),
        "chance_top1": 1.0 / n,
        "chance_top10": min(10.0 / n, 1.0),
        "wall_s": round(time.time() - t0, 1),
        "platform": platform,
    }
    (OUT / "results.json").write_text(json.dumps(res, indent=2))
    print("retrieval demo:", json.dumps(res))
    assert res["top1"] > res["chance_top1"], "no learning signal"


if __name__ == "__main__":
    main()
