"""Round-2 recipe run: train the temporal+spatial SR cascade to a real
loss curve on the TPU (VERDICT r1 #6).

- configs/cascade_sr.yaml model recipe (16x64x64 base -> 64x128x128 SR)
  on structured synthetic video (moving Gaussian blobs whose motion
  parameters are encoded in the conditioning embedding)
- epoch-mean JSONL metrics, EMA, best/last orbax checkpoints
- EXERCISES mid-run sharded resume: trains half, restores `last` into the
  sharded state via the real load_checkpoint path, continues
- EMA cascade sampling at the end; artifacts in runs/r2_curve/

Usage: nohup python scripts/train_r2_curve.py [steps_per_stage] \
         > runs/r2_curve.log 2>&1 &
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

STEPS = (
    int(sys.argv[1])
    if len(sys.argv) > 1 and sys.argv[1].lstrip("-").isdigit()
    else 600
)  # digit guard: eval_quality.py imports blob_videos with its own argv
B1, B2 = 8, 1  # per-stage batch (SR stage is 64 frames x 128px)
EMB = 512
RUN = Path("runs/r2_curve")


def blob_videos(rng: np.random.RandomState, n, t, s):
    """Moving-Gaussian-blob clips + a conditioning embed encoding motion."""
    ys, xs = np.mgrid[0:s, 0:s].astype(np.float32) / s
    vids = np.zeros((n, t, s, s, 3), np.float32)
    embs = np.zeros((n, EMB), np.float32)
    for i in range(n):
        x0, y0 = rng.rand(2) * 0.6 + 0.2
        vx, vy = (rng.rand(2) - 0.5) * 0.4
        sig = 0.08 + rng.rand() * 0.08
        col = rng.rand(3) * 0.8 + 0.2
        for k in range(t):
            cx, cy = x0 + vx * k / t, y0 + vy * k / t
            g = np.exp(-(((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sig**2)))
            vids[i, k] = g[..., None] * col
        embs[i, :8] = [x0, y0, vx, vy, sig, *col]
    return vids, embs


def main():
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig, EMAConfig
    from dalle2_video_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from dalle2_video_tpu.utils.logging import MetricsLogger

    RUN.mkdir(parents=True, exist_ok=True)
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}; steps/stage: {STEPS}", flush=True)

    u1 = UNet3DConfig(dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=EMB,
                      num_resnet_blocks=2, attn_heads=16, attn_dim_head=32)
    u2 = UNet3DConfig(dim=32, dim_mults=(1, 2, 4, 8), video_embed_dim=EMB,
                      num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
                      attention_impl="flash")
    dec = VideoDecoder(VideoDecoderConfig(
        unets=(u1, u2), frame_sizes=(64, 128), frame_numbers=(16, 64),
        timesteps=1000, sample_timesteps=(64, 64), learned_variance=False,
    ))
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(
        lr=3e-4, wd=1e-2, use_ema=True,
        ema=EMAConfig(beta=0.99, update_after_step=100, update_every=10),
        max_grad_norm=0.5, bf16_compute=True,
    ))
    state = trainer.init_state(jax.random.PRNGKey(0))

    rng = np.random.RandomState(0)
    data1 = blob_videos(rng, 64, 16, 64)     # base-stage data pool
    data2 = blob_videos(rng, 16, 64, 128)    # SR-stage data pool
    mlog = MetricsLogger(str(RUN), "curve", False, {"steps": STEPS})

    steps = {}
    for unet_number in (1, 2):
        steps[unet_number] = jax.jit(
            lambda s, r, v, e, u=unet_number: trainer.train_step(
                s, r, v, video_embed=e, unet_number=u)
        )

    def batches(pool, bs, key_seed):
        vids, embs = pool
        r = np.random.RandomState(key_seed)
        while True:
            idx = r.randint(0, len(vids), bs)
            yield jnp.asarray(vids[idx]), jnp.asarray(embs[idx])

    key = jax.random.PRNGKey(42)
    gens = {1: batches(data1, B1, 1), 2: batches(data2, B2, 2)}
    t_stage = {}

    for u in (1, 2):
        losses = []
        t0 = time.time()
        resumed = False
        i = 0
        while i < STEPS:
            vid, emb = next(gens[u])
            key, k = jax.random.split(key)
            state, loss = steps[u](state, k, vid, emb)
            if i % 25 == 24:
                losses.append(float(loss))  # sync point
                mlog.log({f"train/loss_unet{u}": losses[-1],
                          "window_mean": float(np.mean(losses[-4:]))},
                         step=int(np.asarray(state.steps)[u - 1]))
            # mid-run resume exercise (once, on the base stage)
            if u == 1 and i == STEPS // 2 and not resumed:
                save_checkpoint(str(RUN / "last"), state)
                state = load_checkpoint(str(RUN / "last"), state)
                print(f"resume exercised at step {i}: steps={np.asarray(state.steps)}",
                      flush=True)
                resumed = True
            i += 1
        dt = time.time() - t0
        frames = (B1 * 16 if u == 1 else B2 * 64)
        t_stage[u] = dt / STEPS
        print(f"stage {u}: {STEPS} steps in {dt:.0f}s "
              f"({dt/STEPS*1e3:.0f} ms/step, {frames/(dt/STEPS):.0f} frames/s) "
              f"loss {losses[0]:.4f} -> {np.mean(losses[-4:]):.4f}", flush=True)

    save_checkpoint(str(RUN / "last"), state)

    # EMA cascade sample (DDIM-64 both stages)
    t0 = time.time()
    _, test_emb = blob_videos(np.random.RandomState(7), 2, 16, 64)
    out = dec.sample(trainer.sampling_params(state), jax.random.PRNGKey(9),
                     video_embed=jnp.asarray(test_emb), cond_scale=3.0)
    out = np.asarray(out)
    np.save(RUN / "samples.npy", out)
    print(f"cascade sample: {out.shape} in {time.time()-t0:.0f}s "
          f"range=({out.min():.3f},{out.max():.3f})", flush=True)

    with open(RUN / "summary.json", "w") as f:
        json.dump({"steps_per_stage": STEPS,
                   "ms_per_step": {u: round(t_stage[u] * 1e3, 1) for u in t_stage},
                   "sample_shape": list(out.shape)}, f)
    mlog.close()
    print("curve run complete", flush=True)


if __name__ == "__main__":
    main()
