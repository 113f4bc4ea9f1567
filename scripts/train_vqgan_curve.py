"""Round-2 VQGAN training curve on the real TPU (ROADMAP #7 evidence).

Trains the adversarial VQGAN (train/vqgan_trainer.py) on structured
synthetic video (moving Gaussian blobs — reconstructable content, unlike
uniform noise) long enough to show the taming-recipe dynamics working:
recon L1 falling, discriminator engaging after disc_start, adaptive lambda
non-degenerate. Writes metrics JSONL + an original-vs-reconstruction pair
to runs/vqgan_curve/.

Run:  nohup python scripts/train_vqgan_curve.py > runs/vqgan_curve.log 2>&1 &
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

RUN = Path("runs/vqgan_curve")
STEPS = 600
B, T, S = 8, 4, 64


def main():
    from dalle2_video_tpu.models.discriminator import PatchDiscriminator
    from dalle2_video_tpu.models.vqvae import VQVAE
    from dalle2_video_tpu.train.checkpoint import save_checkpoint
    from dalle2_video_tpu.train.vqgan_trainer import VQGanTrainer, VQGanTrainerConfig
    from dalle2_video_tpu.utils.logging import MetricsLogger

    RUN.mkdir(parents=True, exist_ok=True)
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    vae = VQVAE(latent_dim=4, base_dim=64, num_down=2, codebook_size=512)
    disc = PatchDiscriminator(base_dim=64, num_layers=3)
    trainer = VQGanTrainer(vae, disc, VQGanTrainerConfig(
        lr_g=1e-4, lr_d=1e-4, disc_start=200, disc_weight=0.8,
        perceptual_weight=1.0,
    ))
    state = trainer.init_state(jax.random.PRNGKey(0), frame_size=S, frames=T)

    rng = np.random.RandomState(0)
    pool, _ = blob_videos(rng, 64, T, S)
    step = jax.jit(trainer.train_step)
    mlog = MetricsLogger(str(RUN), "vqgan", False, {"steps": STEPS})

    t0 = time.time()
    for i in range(STEPS):
        idx = rng.randint(0, pool.shape[0], B)
        batch = jnp.asarray(pool[idx])
        state, m = step(state, batch)
        if i == 0:
            print(f"first step (compile): {time.time()-t0:.0f}s", flush=True)
        if (i + 1) % 50 == 0:
            m = {k: float(v) for k, v in m.items()}
            mlog.log({f"train/{k}": v for k, v in m.items()}, step=i + 1)
            print(f"step {i+1}: rec={m['loss/rec']:.4f} vq={m['loss/vq']:.4f} "
                  f"d={m['loss/d']:.4f} lam={m['lambda_adapt']:.3g} "
                  f"logits r/f={m['logits/real']:.2f}/{m['logits/fake']:.2f}",
                  flush=True)

    dt = (time.time() - t0) / STEPS
    print(f"avg {dt*1e3:.0f} ms/step ({B*T/dt:.0f} frames/s)", flush=True)

    # evidence artifact: original vs reconstruction
    test = jnp.asarray(pool[:4])
    ev = trainer.eval_recon(state, test)
    recon, _ = trainer._recon(state.vae_params, test)
    np.save(RUN / "orig.npy", np.asarray(test))
    np.save(RUN / "recon.npy", np.asarray(recon))
    save_checkpoint(str(RUN / "vae_params"), state.vae_params)
    summary = {k: float(v) for k, v in ev.items()}
    summary["ms_per_step"] = round(dt * 1e3, 1)
    (RUN / "summary.json").write_text(json.dumps(summary, indent=1))
    print("summary:", summary, flush=True)
    print("vqgan curve complete", flush=True)


if __name__ == "__main__":
    main()
