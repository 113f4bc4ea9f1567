"""Quality scoring: ViViT-FVD + DDIM step-count ladder + sample grids.

VERDICT r2 #3/#7: the FVD harness (utils/fvd.py) had never produced a
number on real samples. This script scores the r2_curve cascade checkpoint
(runs/r2_curve/last, trained on the structured blob corpus by
train_r2_curve.py):

  1. generates N base-stage samples conditioned on HELD-OUT blob motion
     embeds at several DDIM step counts (the speed/quality ladder)
  2. computes ViViT-FVD real-vs-generated per ladder point, with two
     calibration anchors: split-half real-vs-real (floor) and
     real-vs-noise (ceiling)
  3. saves sample-grid PNGs (base stage + full cascade) to the run dir

Extractor: a FIXED-SEED ViViT video tower (self-consistent "ViViT-FVD" —
utils/fvd.py docstring; the canonical Kinetics-I3D cannot be fetched here,
zero egress). Pass --vivit <ckpt> to use a trained tower instead; numbers
are comparable only within one extractor.

Run:  nohup python scripts/eval_quality.py > runs/eval_quality.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

RUN = Path("runs/r2_curve")
OUT = Path("runs/eval_quality")
N = 64          # sample count per ladder point (and real set size)
BATCH = 16
# DDIM step counts; override with e.g. `--ladder 250` to fill in one point
LADDER = tuple(
    int(x) for x in (
        sys.argv[sys.argv.index("--ladder") + 1].split(",")
        if "--ladder" in sys.argv else (8, 16, 64, 250)
    )
)
# few-step sampler for the ladder: "ddim" (default) or "dpmpp"
# (DPM-Solver++(2M)); result keys are fvd_<sampler><steps>
SAMPLER = (
    sys.argv[sys.argv.index("--sampler") + 1]
    if "--sampler" in sys.argv else "ddim"
)
COND_SCALE = 2.0
EMB = 512


def build():
    """The exact train_r2_curve.py recipe (checkpoint compatibility)."""
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig, EMAConfig

    u1 = UNet3DConfig(dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=EMB,
                      num_resnet_blocks=2, attn_heads=16, attn_dim_head=32)
    u2 = UNet3DConfig(dim=32, dim_mults=(1, 2, 4, 8), video_embed_dim=EMB,
                      num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
                      attention_impl="flash")
    cfg = VideoDecoderConfig(
        unets=(u1, u2), frame_sizes=(64, 128), frame_numbers=(16, 64),
        timesteps=1000, sample_timesteps=(64, 64), learned_variance=False,
        sample_compute_dtype="bfloat16",
    )
    dec = VideoDecoder(cfg)
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(
        lr=3e-4, wd=1e-2, use_ema=True, max_grad_norm=0.5, bf16_compute=True,
    ))
    return cfg, dec, trainer


def vivit_embed_fn(vivit_ckpt=None):
    """Fixed-seed (or trained) ViViT feature extractor for 16x64x64 clips."""
    from dalle2_video_tpu.models.vivit import ViViT, ViViTConfig

    vcfg = ViViTConfig(dim=256, num_frames=16, frame_size=64, patch_size=16,
                       depth=2, heads=4, dim_head=32, scale_dim_conv=2)
    vivit = ViViT(vcfg)
    if vivit_ckpt:
        from dalle2_video_tpu.train.checkpoint import load_checkpoint

        params = load_checkpoint(
            vivit_ckpt,
            vivit.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 16, 64, 64, 3))),
        )
        provenance = f"trained ({vivit_ckpt})"
    else:
        params = vivit.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 16, 64, 64, 3)))
        provenance = "fixed-seed random init (seed 0)"
    apply = jax.jit(lambda v: vivit.apply(params, v))

    def embed(videos):
        return np.asarray(apply(jnp.asarray(videos, jnp.float32)))

    return embed, provenance


def save_grid(path: Path, videos: np.ndarray, n_rows: int = 6,
              n_frames: int = 8) -> None:
    """(N, T, H, W, C) in [0,1] -> PNG grid: rows = samples, cols = frames."""
    import imageio.v2 as imageio

    v = np.clip(np.asarray(videos[:n_rows], np.float32), 0, 1)
    t_idx = np.linspace(0, v.shape[1] - 1, n_frames).astype(int)
    rows = [np.concatenate([v[i, t] for t in t_idx], axis=1)
            for i in range(v.shape[0])]
    grid = (np.concatenate(rows, axis=0) * 255).astype(np.uint8)
    imageio.imwrite(path, grid)


def main():
    from dalle2_video_tpu.train.checkpoint import load_checkpoint
    from dalle2_video_tpu.utils.fvd import compute_fvd, fvd_from_features

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from train_r2_curve import blob_videos

    OUT.mkdir(parents=True, exist_ok=True)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    import dataclasses

    cfg, dec, trainer = build()
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = load_checkpoint(str(RUN / "last"), state)
    params = trainer.sampling_params(state, use_ema=True)
    print("checkpoint loaded:", RUN / "last", flush=True)

    # held-out corpus: seed 123 (training pools used RandomState(0))
    reals, embs = blob_videos(np.random.RandomState(123), N, 16, 64)
    embed_fn, provenance = vivit_embed_fn(
        sys.argv[sys.argv.index("--vivit") + 1]
        if "--vivit" in sys.argv else None)
    print(f"FVD extractor: {provenance}", flush=True)

    # resumable: merge into any prior results.json and write after every
    # stage (a 250-step ladder point once died to a TPU-worker crash)
    results = {"extractor": provenance, "n": N, "cond_scale": COND_SCALE}
    if (OUT / "results.json").exists():
        results = {**json.loads((OUT / "results.json").read_text()), **results}

    def flush():
        (OUT / "results.json").write_text(json.dumps(results, indent=1))

    # calibration anchors
    feats_real = embed_fn(reals)
    half = N // 2
    results["fvd_real_vs_real_splithalf"] = round(
        fvd_from_features(feats_real[:half], feats_real[half:]), 3)
    noise = np.random.RandomState(7).rand(N, 16, 64, 64, 3).astype(np.float32)
    results["fvd_real_vs_noise"] = round(
        compute_fvd(reals, noise, embed_fn), 3)
    print("anchors:", results, flush=True)
    flush()

    # DDIM ladder on the base stage
    from dalle2_video_tpu.engine.decoder import VideoDecoder

    for st in LADDER:
        dec_st = VideoDecoder(dataclasses.replace(
            cfg, sample_timesteps=(st, st), sampler=SAMPLER))
        t0 = time.time()
        fakes = []
        for s in range(0, N, BATCH):
            k = jax.random.PRNGKey(1000 + s)
            fakes.append(np.asarray(dec_st.sample(
                params, k, video_embed=jnp.asarray(embs[s:s + BATCH]),
                cond_scale=COND_SCALE, stop_at_unet_number=1)))
        fakes = np.concatenate(fakes, axis=0)
        dt = time.time() - t0
        # reuse feats_real (computed once above) instead of re-embedding
        # the identical real set per ladder point (tunnel dispatches are
        # the documented bottleneck on this backend)
        fvd = fvd_from_features(feats_real, embed_fn(fakes))
        results[f"fvd_{SAMPLER}{st}"] = round(fvd, 3)
        results[f"sample_s_{SAMPLER}{st}"] = round(dt, 1)
        print(f"{SAMPLER.upper()}-{st}: FVD={fvd:.3f} ({dt:.0f}s for {N} "
              "clips)", flush=True)
        flush()
        if st == 64 and SAMPLER == "ddim":
            save_grid(OUT / "grid_base_ddim64.png", fakes)
            np.save(OUT / "samples_base_ddim64.npy", fakes[:8])
    save_grid(OUT / "grid_real.png", reals)

    # one full-cascade sample grid (base -> 64-frame 128px SR)
    k = jax.random.PRNGKey(2024)
    casc = np.asarray(dec.sample(
        params, k, video_embed=jnp.asarray(embs[:2]), cond_scale=COND_SCALE))
    save_grid(OUT / "grid_cascade_128px.png", casc, n_rows=2)
    results["cascade_sample_shape"] = list(casc.shape)
    flush()

    # grid for the 90-frame ref-recipe artifact if present
    ref = Path("runs/ref_recipe_curve/sample_90f_128px.npy")
    if ref.exists():
        save_grid(OUT / "grid_ref_recipe_90f.png", np.load(ref),
                  n_rows=1, n_frames=10)

    (OUT / "results.json").write_text(json.dumps(results, indent=1))
    print("RESULTS", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
