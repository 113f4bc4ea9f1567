"""Round-2 recipe run: train the temporal+spatial SR cascade to a real
loss curve on the TPU (VERDICT r1 #6).

- configs/cascade_sr.yaml model recipe (16x64x64 base -> 64x128x128 SR)
  on structured synthetic video (moving Gaussian blobs whose motion
  parameters are encoded in the conditioning embedding)
- epoch-mean JSONL metrics, EMA, best/last orbax checkpoints
- EXERCISES mid-run sharded resume: trains half, restores `last` into the
  sharded state via the real load_checkpoint path, continues
- EMA cascade sampling at the end; artifacts in runs/r2_curve/
- RESTART-SAFE (r5): checkpoints runs/r2_curve/last every SAVE_EVERY
  steps with a progress file; a relaunch resumes from the last save
  instead of restarting the multi-hour run (the r3/r4 chains both died
  because a queue kill here meant starting over). Per-step PRNG keys are
  fold_in(stage, step) so resume is O(1), not a replayed split chain.

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

    def batches(pool, bs, key_seed, skip=0):
        vids, embs = pool
        r = np.random.RandomState(key_seed)
        for _ in range(skip):  # O(1)-cheap draw replay for resume
            r.randint(0, len(vids), bs)
        while True:
            idx = r.randint(0, len(vids), bs)
            yield jnp.asarray(vids[idx]), jnp.asarray(embs[idx])

    key = jax.random.PRNGKey(42)
    t_stage = {}
    SAVE_EVERY = 500
    progress_file = RUN / "progress.json"

    # Restart-safe resume: progress.json records (stage, next_step) at every
    # periodic checkpoint; a relaunch restores runs/r2_curve/last and skips
    # completed work instead of restarting the multi-hour run.
    start_stage, start_step = 1, 0
    if progress_file.exists() and (RUN / "last").exists():
        prog = json.loads(progress_file.read_text())
        state = load_checkpoint(str(RUN / "last"), state)
        start_stage, start_step = prog["stage"], prog["next_step"]
        print(f"RESUMED from progress.json: stage {start_stage} step "
              f"{start_step}; steps={np.asarray(state.steps)}", flush=True)

    def save_progress(stage, next_step):
        save_checkpoint(str(RUN / "last"), state)
        progress_file.write_text(json.dumps(
            {"stage": stage, "next_step": next_step}))

    for u in (1, 2):
        if u < start_stage:
            t_stage[u] = float("nan")
            continue
        i = start_step if u == start_stage else 0
        gen = batches(data1 if u == 1 else data2, B1 if u == 1 else B2,
                      u, skip=i)
        losses = []
        t0 = time.time()
        n0 = i
        while i < STEPS:
            vid, emb = next(gen)
            # fold_in, not a split chain: key_i is a pure function of
            # (stage, step) so resume needs no replay
            k = jax.random.fold_in(key, u * 1_000_000 + i)
            state, loss = steps[u](state, k, vid, emb)
            if i % 25 == 24:
                losses.append(float(loss))  # sync point
                mlog.log({f"train/loss_unet{u}": losses[-1],
                          "window_mean": float(np.mean(losses[-4:]))},
                         step=int(np.asarray(state.steps)[u - 1]))
            # mid-run resume exercise (once, on the base stage)
            if u == 1 and i == STEPS // 2:
                save_progress(u, i + 1)
                state = load_checkpoint(str(RUN / "last"), state)
                print(f"resume exercised at step {i}: steps={np.asarray(state.steps)}",
                      flush=True)
            elif i % SAVE_EVERY == SAVE_EVERY - 1:
                save_progress(u, i + 1)
            i += 1
        dt = time.time() - t0
        n_done = i - n0
        frames = (B1 * 16 if u == 1 else B2 * 64)
        t_stage[u] = dt / max(n_done, 1)
        if losses:
            print(f"stage {u}: {n_done} steps in {dt:.0f}s "
                  f"({t_stage[u]*1e3:.0f} ms/step, {frames/t_stage[u]:.0f} frames/s) "
                  f"loss {losses[0]:.4f} -> {np.mean(losses[-4:]):.4f}", flush=True)
        save_progress(u + 1, 0)

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
