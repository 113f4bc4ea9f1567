"""End-to-end pipeline smoke: every entry point, in order, on synthetic data.

    synthetic mp4 corpus
      -> scripts/preprocess.py   (decode -> .vshard + tokens)
      -> scripts/train_clip.py   (ViViT + frozen text tower)
      -> scripts/eval_clip.py    (dump text/video embeddings)
      -> scripts/train_prior.py  (text-embed -> video-embed prior)
      -> scripts/train_decoder.py(cascade decoder, GSPMD mesh)
      -> scripts/sample.py       (text -> video through the whole stack)

Tiny dims, CPU platform. This is the reference's full workflow
(README.md:66-80) driven through the actual CLIs. Exit code 0 = the
complete framework works end to end.

    python scripts/e2e_smoke.py [workdir]
"""

from __future__ import annotations

import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent.parent


def make_corpus(root: Path, n: int = 8, frames: int = 25, size: int = 48) -> None:
    import cv2

    (root / "texts/face40_details_new").mkdir(parents=True)
    (root / "texts/emotion").mkdir()
    (root / "videos").mkdir()
    # Captions must be token-DISTINCT from each other: the demo text tower
    # is a frozen random init (no OpenAI weights in-env), and captions
    # that differ by a single token map through it to nearly identical
    # embeddings (measured cos 0.998 across 'a person number {i} ...'
    # captions), which makes the contrastive target degenerate and
    # collapses the video tower. Word-pool captions keep every pair's
    # target well separated.
    adj = ["red", "blue", "green", "golden", "silver", "purple", "orange",
           "black"]
    noun = ["robot", "tiger", "dancer", "pianist", "sailor", "wizard",
            "athlete", "chef"]
    verb = ["spinning", "jumping", "waving", "sprinting", "bowing",
            "clapping", "diving", "marching"]
    place = ["beach", "rooftop", "forest", "stage", "bridge", "market",
             "harbor", "garden"]
    for i in range(n):
        (root / f"texts/face40_details_new/c{i:02d}.txt").write_text(
            f"a {adj[i % 8]} {noun[i // 8 % 8]} is {verb[i * 3 % 8]} "
            f"near the {place[i * 5 % 8]}"
        )
        (root / f"texts/emotion/c{i:02d}.txt").write_text("neutral")
        vw = cv2.VideoWriter(
            str(root / f"videos/c{i:02d}.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"), frames, (size, size),
        )
        rng = np.random.RandomState(i)
        base = rng.randint(0, 255, (size, size, 3), np.uint8)
        for t in range(frames):
            vw.write(np.roll(base, t, axis=1))  # moving pattern
        vw.release()


def write_config(work: Path) -> Path:
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
dim: 32
channels: 3
train_name: e2e
train_ratio: 0.75
seed: 0
run_dir: {work}/runs
use_wandb: false
log_level: INFO
platform: cpu
mesh: {{data: -1, model: 1}}
video_encoder: {{frame_size: 32, patch_size: 16, num_frames: 25, dim: 32, depth: 1, heads: 2, dim_head: 8}}
clip: {{batch_size: 4, lr: 1.0e-3, lr_scheduler: constant, lr_multistep_milestones: [0.5], lr_step_gamma: 0.5, epochs: 2, init_temperature: 5.0, openai_ckpt: null}}
unet1: {{dim: 8, dim_mults: [1, 2], num_resnet_blocks: 1, attn_heads: 2, attn_dim_head: 4}}
unet2: {{dim: 8, dim_mults: [1, 2], num_resnet_blocks: 1, attn_heads: 2, attn_dim_head: 4}}
frame_sizes: [8, 16]
frame_numbers: [2, 2]
timesteps: 10
sample_timesteps: null
learned_variance: false
decoder: {{batch_size: 4, epochs: 1, bf16_compute: false}}
loader: grain
loader_workers: 0
decoder_trainer: {{lr: 3.0e-4, wd: 1.0e-2, use_ema: true, ema_beta: 0.99, ema_update_after_step: 1, ema_update_every: 1, max_grad_norm: 0.5, grad_accum: 1}}
prior: {{depth: 1, heads: 2, dim_head: 8, timesteps: 10, sample_timesteps: 4, batch_size: 4, lr: 1.0e-3, epochs: 2}}
"""
    path = work / "e2e.yaml"
    path.write_text(cfg)
    return path


def run_stage(name: str, script: str, cfg_path: Path, *extra: str) -> None:
    print(f"--- {name} ---", flush=True)
    r = subprocess.run(
        [sys.executable, str(ROOT / "scripts" / script), str(cfg_path), *extra],
        cwd=ROOT, capture_output=True, text=True,
    )
    if r.returncode != 0:
        print(r.stdout[-3000:])
        print(r.stderr[-5000:])
        raise SystemExit(f"{name} FAILED (exit {r.returncode})")
    print(f"{name} OK", flush=True)


def main() -> None:
    work = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(tempfile.mkdtemp(prefix="e2e_"))
    work.mkdir(parents=True, exist_ok=True)
    print("workdir:", work)

    make_corpus(work)
    cfg_path = write_config(work)

    run_stage("preprocess", "preprocess.py", cfg_path)
    run_stage("train_clip", "train_clip.py", cfg_path)
    run_stage("eval_clip", "eval_clip.py", cfg_path)
    run_stage("train_prior", "train_prior.py", cfg_path)
    run_stage("train_decoder", "train_decoder.py", cfg_path)
    out = work / "sample.npy"
    run_stage(
        "sample", "sample.py", cfg_path,
        "prompt=a person smiling", "cond_scale=2.0", f"out={out}",
    )

    video = np.load(out)
    assert np.isfinite(video).all(), "sampled video has non-finite values"
    print(f"E2E OK: sampled video {video.shape}, range "
          f"[{video.min():.3f}, {video.max():.3f}]")


if __name__ == "__main__":
    main()
