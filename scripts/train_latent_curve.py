"""Round-2 latent video diffusion curve on the real TPU.

The full latent pipeline (ROADMAP #7 capstone): take the adversarially
trained VQGAN from scripts/train_vqgan_curve.py, freeze it as the
VideoDecoder's stage VAE, train the denoiser IN LATENT SPACE (64px frames
-> 16x16x4 latents, predict_x_start per reference
predict_x_start_for_latent_diffusion), then sample end-to-end
(latent DDPM -> VQ decode -> pixels). Writes metrics + sample artifacts to
runs/latent_curve/.

Run:  nohup python scripts/train_latent_curve.py > runs/latent_curve.log 2>&1 &
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

from scripts.train_r2_curve import blob_videos

RUN = Path("runs/latent_curve")
VQ_RUN = Path("runs/vqgan_curve")
STEPS = 600
B, T, S, EMB = 8, 4, 64, 512


def main():
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.models.vqvae import VQVAE
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig
    from dalle2_video_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from dalle2_video_tpu.utils.logging import MetricsLogger

    RUN.mkdir(parents=True, exist_ok=True)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    # frozen stage-0 VAE from the adversarial run (val rec_l1 0.026)
    vae = VQVAE(latent_dim=4, base_dim=64, num_down=2, codebook_size=512)
    vae_params = vae.init_params(jax.random.PRNGKey(0), frame_size=S, frames=T)
    vae_params = load_checkpoint(str(VQ_RUN / "vae_params"), vae_params)
    print("loaded VQGAN vae from", VQ_RUN / "vae_params", flush=True)

    unet = UNet3DConfig(dim=64, dim_mults=(1, 2, 4), video_embed_dim=EMB,
                        num_resnet_blocks=2, attn_heads=8, attn_dim_head=32)
    dec = VideoDecoder(
        VideoDecoderConfig(
            unets=(unet,), frame_sizes=(S,), frame_numbers=(T,),
            timesteps=1000, sample_timesteps=64, learned_variance=False,
            predict_x_start_for_latent_diffusion=True,
        ),
        vaes=(vae,),
    )
    assert dec.unet_configs[0].channels == 4  # latent-space denoiser
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(
        lr=3e-4, use_ema=True, bf16_compute=True))
    state = trainer.init_state(jax.random.PRNGKey(1))
    # swap in the trained frozen VAE (EMA shadows cover unets only; VAEs
    # ride in state.params and are never differentiated)
    state.params["vae_0"] = vae_params

    rng = np.random.RandomState(0)
    pool, embs = blob_videos(rng, 64, T, S)
    step = jax.jit(lambda s, r, v, e: trainer.train_step(
        s, r, v, video_embed=e))
    mlog = MetricsLogger(str(RUN), "latent", False, {"steps": STEPS})

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
        if (i + 1) % 50 == 0:
            m = float(jnp.mean(jnp.stack(losses[-50:])))
            mlog.log({"train/loss": m}, step=i + 1)
            print(f"step {i+1}: loss(mean50)={m:.4f}", flush=True)
    dt = (time.time() - t0) / STEPS
    print(f"avg {dt*1e3:.0f} ms/step ({B*T/dt:.0f} frames/s, latent space)",
          flush=True)

    # end-to-end latent sampling: DDIM-64 in 16x16x4, VQ decode to pixels
    t0 = time.time()
    sample = dec.sample(
        trainer.sampling_params(state), jax.random.PRNGKey(3),
        video_embed=jnp.asarray(embs[:4]), cond_scale=2.0,
    )
    print(f"latent sample: {sample.shape} in {time.time()-t0:.0f}s "
          f"range=({float(sample.min()):.3f},{float(sample.max()):.3f})",
          flush=True)
    np.save(RUN / "samples.npy", np.asarray(sample))
    save_checkpoint(str(RUN / "last"), state)
    (RUN / "summary.json").write_text(json.dumps({
        "loss_first50": float(np.mean(losses[:50])),
        "loss_last50": float(np.mean(losses[-50:])),
        "ms_per_step": round(dt * 1e3, 1),
        "sample_shape": list(sample.shape),
    }, indent=1))
    print("latent curve complete", flush=True)


if __name__ == "__main__":
    main()
