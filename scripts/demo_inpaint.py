"""Conditional-generation demo + scoring on the trained r2_curve decoder.

Exercises the three inpainting modes (engine/decoder.py — the reference
samples from noise only) with a TRAINED model and scores each:

  * video extension      — first 4 of 16 frames known
  * temporal interpolation — every 4th frame known
  * spatial inpainting   — left half of every frame known

For each mode: known-region exactness (replacement method invariant:
must be ~0), ViViT-FVD of the conditionally generated clips against the
held-out real set (same fixed-seed extractor as scripts/eval_quality.py,
numbers comparable within that extractor), and a grid PNG. Also reports
the guided variant (VDM eq. 7) on the extension mode.

Run (after train_r2_curve.py has produced runs/r2_curve/last):
    python scripts/demo_inpaint.py > runs/demo_inpaint.log 2>&1
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
OUT = Path("runs/demo_inpaint")
N = 64
BATCH = 16
STEPS = 64
COND_SCALE = 2.0


def masks_for(mode: str, t: int, s: int) -> np.ndarray:
    m = np.zeros((1, t, 1, 1, 1), np.float32)
    if mode == "extend":
        m[:, : t // 4] = 1.0
    elif mode == "interpolate":
        m[:, ::4] = 1.0
    elif mode == "spatial":
        m = np.zeros((1, 1, s, s, 1), np.float32)
        m[:, :, :, : s // 2] = 1.0
    else:
        raise ValueError(mode)
    return m


def main():
    from scripts.eval_quality import build, save_grid, vivit_embed_fn
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

    # held-out corpus, DISJOINT seed from eval_quality's 123
    reals, embs = blob_videos(np.random.RandomState(321), N, 16, 64)
    embed_fn, provenance = vivit_embed_fn()
    feats_real = embed_fn(reals)
    print(f"FVD extractor: {provenance}", flush=True)

    results = {"extractor": provenance, "n": N, "steps": STEPS,
               "cond_scale": COND_SCALE}
    if (OUT / "results.json").exists():
        results = {**json.loads((OUT / "results.json").read_text()), **results}

    def flush():
        (OUT / "results.json").write_text(json.dumps(results, indent=1))

    dec_st = type(dec)(dataclasses.replace(
        cfg, sample_timesteps=(STEPS, STEPS)))

    jobs = [("extend", "replace"), ("interpolate", "replace"),
            ("spatial", "replace"), ("extend", "guided")]
    for mode, method in jobs:
        tag = mode if method == "replace" else f"{mode}_{method}"
        if f"{tag}_fvd" in results:
            # resumable: a prior (possibly seeded — see results.json
            # provenance notes) score for this variant stands; spend the
            # chip on the variants that are still missing
            print(f"{tag}: already scored — skip", flush=True)
            continue
        mask = masks_for(mode, 16, 64)
        t0 = time.time()
        outs = []
        for s in range(0, N, BATCH):
            k = jax.random.PRNGKey(5000 + s)
            outs.append(np.asarray(dec_st.sample(
                params, k, video_embed=jnp.asarray(embs[s:s + BATCH]),
                cond_scale=COND_SCALE, stop_at_unet_number=1,
                inpaint_video=jnp.asarray(reals[s:s + BATCH]),
                inpaint_mask=jnp.asarray(mask),
                inpaint_method=method)))
        outs = np.concatenate(outs, axis=0)
        dt = time.time() - t0

        m = np.broadcast_to(mask, outs.shape[:4] + (1,))
        known_err = float(np.abs((outs - reals) * m).max())
        gen_dev = float(
            np.abs((outs - reals) * (1 - m)).max())  # generated ≠ copy
        fvd = fvd_from_features(feats_real, embed_fn(outs))
        results[f"{tag}_known_max_err"] = round(known_err, 6)
        results[f"{tag}_gen_deviation"] = round(gen_dev, 4)
        results[f"{tag}_fvd"] = round(fvd, 3)
        results[f"{tag}_sample_s"] = round(dt, 1)
        print(f"{tag}: known_err={known_err:.2e} gen_dev={gen_dev:.3f} "
              f"FVD={fvd:.3f} ({dt:.0f}s)", flush=True)
        flush()
        save_grid(OUT / f"grid_{tag}.png", outs)
    save_grid(OUT / "grid_real.png", reals)
    print("results:", json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
