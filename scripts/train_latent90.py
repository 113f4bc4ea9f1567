"""Latent 90-frame video diffusion on the real TPU (ROADMAP 3+ item 7).

The reference's shipped recipe is 90 frames at 128px, which it never got
training at all (README.md:10 — ZeRO-3 fails even at batch 1, in PIXEL
space). Round 1 trained that exact recipe here in pixel space; this run
moves it to LATENT space — the production-credible way to own 90x128x128:

  * the adversarially trained VQGAN (runs/vqgan_curve, fully
    convolutional, trained at 64px) encodes 90x128x128x3 pixels to
    90x32x32x4 latents frame-wise (f4) — a 48x byte reduction
  * the latent denoiser (dim 64, mults 1-2-4) trains with the joint
    space-time bottleneck at 90*8*8 = 5760 tokens — flash attention
    territory (attention_impl auto), but 4x smaller than the 23k pixel
    bottleneck of the same recipe
  * predict_x_start (reference predict_x_start_for_latent_diffusion,
    dalle2_video.py:1300-1305 semantics) since latent scales are not
    noise-normalized
  * end-to-end sample: latent DDIM-64 -> VQ decode -> 90x128x128 pixels

Run:  nohup python scripts/train_latent90.py > runs/latent90.log 2>&1 &
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

from train_r2_curve import EMB, blob_videos

RUN = Path("runs/latent90")
VQ_RUN = Path("runs/vqgan_curve")
STEPS = 400
B, T, S = 8, 90, 128


def main():
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.models.vqvae import VQVAE
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig
    from dalle2_video_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from dalle2_video_tpu.utils.logging import MetricsLogger

    RUN.mkdir(parents=True, exist_ok=True)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    # frozen VQGAN from the adversarial 64px run — fully convolutional, so
    # the same params encode 128px frames (to 32x32x4 latents)
    vae = VQVAE(latent_dim=4, base_dim=64, num_down=2, codebook_size=512)
    vae_params = vae.init_params(jax.random.PRNGKey(0), frame_size=64, frames=4)
    vae_params = load_checkpoint(str(VQ_RUN / "vae_params"), vae_params)
    print("loaded VQGAN vae from", VQ_RUN / "vae_params", flush=True)

    unet = UNet3DConfig(dim=64, dim_mults=(1, 2, 4), video_embed_dim=EMB,
                        num_resnet_blocks=2, attn_heads=8, attn_dim_head=32)
    dec = VideoDecoder(
        VideoDecoderConfig(
            unets=(unet,), frame_sizes=(S,), frame_numbers=(T,),
            timesteps=1000, sample_timesteps=64, learned_variance=False,
            predict_x_start_for_latent_diffusion=True,
            sample_compute_dtype="bfloat16",
        ),
        vaes=(vae,),
    )
    assert dec.unet_configs[0].channels == 4  # latent-space denoiser
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(
        lr=3e-4, use_ema=True, bf16_compute=True))
    state = trainer.init_state(jax.random.PRNGKey(1))
    state.params["vae_0"] = vae_params  # frozen (never differentiated)

    rng = np.random.RandomState(0)
    pool, embs = blob_videos(rng, 32, T, S)  # 32 clips x 90x128x128 (~1.1 GB)
    step = jax.jit(lambda s, r, v, e: trainer.train_step(
        s, r, v, video_embed=e))
    mlog = MetricsLogger(str(RUN), "latent90", False, {"steps": STEPS})

    key = jax.random.PRNGKey(2)
    t0 = time.time()
    losses = []
    for i in range(STEPS):
        idx = rng.randint(0, pool.shape[0], B)
        key, k = jax.random.split(key)
        state, loss = step(state, k, jnp.asarray(pool[idx]),
                           jnp.asarray(embs[idx]))
        losses.append(loss)  # on device; synced once per 50-step window
        if i == 0:
            print(f"first step (compile): {time.time()-t0:.0f}s", flush=True)
            t0 = time.time()  # exclude compile from the steady-state rate
        if (i + 1) % 50 == 0:
            m = float(jnp.mean(jnp.stack(losses[-50:])))
            mlog.log({"train/loss": m}, step=i + 1)
            print(f"step {i+1}: loss(mean50)={m:.4f} "
                  f"({(time.time()-t0)/i*1e3:.0f} ms/step)", flush=True)
    dt = (time.time() - t0) / max(STEPS - 1, 1)
    print(f"avg {dt*1e3:.0f} ms/step ({B*T/dt:.0f} frames/s, 90f latent)",
          flush=True)

    # end-to-end: latent DDIM-64 -> VQ decode -> 90x128x128 pixels
    t0 = time.time()
    sample = dec.sample(
        trainer.sampling_params(state), jax.random.PRNGKey(3),
        video_embed=jnp.asarray(embs[:2]), cond_scale=2.0,
    )
    sample_s = time.time() - t0
    print(f"latent90 sample: {sample.shape} in {sample_s:.0f}s "
          f"range=({float(sample.min()):.3f},{float(sample.max()):.3f})",
          flush=True)
    np.save(RUN / "samples.npy", np.asarray(sample, np.float16))

    # grid artifact: 8 frames of each sampled clip
    try:
        from eval_quality import save_grid

        save_grid(RUN / "grid.png", np.asarray(sample))
    except Exception as e:  # noqa: BLE001 — grid is best-effort
        print("grid skipped:", e, flush=True)

    save_checkpoint(str(RUN / "last"), state)
    (RUN / "summary.json").write_text(json.dumps({
        "loss_first50": float(np.mean([float(x) for x in losses[:50]])),
        "loss_last50": float(np.mean([float(x) for x in losses[-50:]])),
        "ms_per_step": round(dt * 1e3, 1),
        "frames_per_s": round(B * T / dt, 1),
        "sample_shape": list(sample.shape),
        "sample_s": round(sample_s, 1),
    }, indent=1))
    print("latent90 complete", flush=True)


if __name__ == "__main__":
    main()
