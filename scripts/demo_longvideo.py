"""Long-video generation demo + scoring on the trained r2_curve decoder.

Exercises engine/longvideo.py with a TRAINED model: the 16-frame decoder
generates 64-frame videos (4x its training window) by autoregressive
sliding-window extension (the reference can only sample the fixed training
length, /root/reference/dalle2_video/dalle2_video.py:2053-2186).

Scores written to runs/demo_longvideo/results.json:
  * windowed FVD — every 16-frame window (stride 8) of the generated long
    videos vs a held-out real set, same fixed-seed ViViT extractor as
    scripts/eval_quality.py (numbers comparable within that extractor);
  * drift — FVD of the FIRST window (a plain cascade sample) vs the LAST
    window (three AR extensions deep): quality decay over the sequence;
  * seam flicker — mean consecutive-frame L1 at window-seam transitions
    over the same statistic everywhere else (ratio ~1 = the stitch is as
    smooth as the video's own motion);
  * a grid PNG spanning all 64 frames.

Run (after train_r2_curve.py has produced runs/r2_curve/last):
    python scripts/demo_longvideo.py > runs/demo_longvideo.log 2>&1
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

RUN = Path("runs/r2_curve")
OUT = Path("runs/demo_longvideo")
N = 32          # long videos generated
N_REAL = 64     # held-out real clips for the FVD reference set
T_LONG = 64     # 4x the 16-frame training window
OVERLAP = 4     # matches the scored video-extension setting (demo_inpaint)
BATCH = 16
STEPS = 64
COND_SCALE = 2.0


def windows(v: np.ndarray, t: int = 16, stride: int = 8) -> np.ndarray:
    """(N, T_long, H, W, C) -> (N * n_win, t, H, W, C) sliding windows."""
    starts = range(0, v.shape[1] - t + 1, stride)
    return np.concatenate([v[:, s:s + t] for s in starts], axis=0)


def seam_flicker(v: np.ndarray, t_win: int, overlap: int) -> dict:
    """Consecutive-frame L1 at window seams vs everywhere else.

    With stride = t_win - overlap, window j's first NEW frame is at index
    j * stride + overlap; the seam transition is (that index - 1) -> it.
    """
    d = np.abs(np.diff(v, axis=1)).mean(axis=(0, 2, 3, 4))  # (T_long - 1,)
    stride = t_win - overlap
    seams = [j * stride + overlap - 1 for j in range(1, 99)
             if j * stride + overlap - 1 < len(d)]
    rest = [i for i in range(len(d)) if i not in seams]
    return {
        "seam_l1": float(d[seams].mean()),
        "base_l1": float(d[rest].mean()),
        "ratio": float(d[seams].mean() / d[rest].mean()),
    }


def main():
    from scripts.eval_quality import build, save_grid, vivit_embed_fn
    from dalle2_video_tpu.engine.longvideo import generate_long_video
    from dalle2_video_tpu.train.checkpoint import load_checkpoint
    from dalle2_video_tpu.utils.fvd import fvd_from_features

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from train_r2_curve import blob_videos

    OUT.mkdir(parents=True, exist_ok=True)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    cfg, dec, trainer = build()
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = load_checkpoint(str(RUN / "last"), state)
    params = trainer.sampling_params(state, use_ema=True)
    print("checkpoint loaded:", RUN / "last", flush=True)

    # held-out corpus (seed 321, same convention as demo_inpaint; disjoint
    # from the training stream and from eval_quality's seed 123)
    reals, embs = blob_videos(np.random.RandomState(321), N_REAL, 16, 64)
    embed_fn, provenance = vivit_embed_fn()
    feats_real = embed_fn(reals)
    print(f"FVD extractor: {provenance}", flush=True)

    dec_st = type(dec)(dataclasses.replace(
        cfg, sample_timesteps=(STEPS, STEPS)))

    t0 = time.time()
    outs = []
    for s in range(0, N, BATCH):
        out = generate_long_video(
            dec_st, params, jax.random.PRNGKey(7000 + s),
            n_frames=T_LONG, overlap=OVERLAP,
            video_embed=jnp.asarray(embs[s:s + BATCH]),
            cond_scale=COND_SCALE, stop_at_unet_number=1,
            jit_stages=True,
        )
        outs.append(np.asarray(out))
    outs = np.concatenate(outs, axis=0)
    dt = time.time() - t0
    assert outs.shape == (N, T_LONG, 64, 64, 3), outs.shape

    results = {
        "extractor": provenance, "n": N, "t_long": T_LONG,
        "overlap": OVERLAP, "steps": STEPS, "cond_scale": COND_SCALE,
        "sample_s": round(dt, 1),
        "frames_per_s": round(N * T_LONG / dt, 2),
    }
    results["fvd_windows"] = round(fvd_from_features(
        feats_real, embed_fn(windows(outs))), 3)
    results["fvd_first_window"] = round(fvd_from_features(
        feats_real, embed_fn(outs[:, :16])), 3)
    results["fvd_last_window"] = round(fvd_from_features(
        feats_real, embed_fn(outs[:, -16:])), 3)
    results.update(seam_flicker(outs, 16, OVERLAP))
    # control: the real clips' own consecutive-frame motion level
    results["real_base_l1"] = float(
        np.abs(np.diff(reals, axis=1)).mean())

    (OUT / "results.json").write_text(json.dumps(results, indent=1))
    save_grid(OUT / "grid_long.png", outs, n_frames=16)
    save_grid(OUT / "grid_real.png", reals)
    print("results:", json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
