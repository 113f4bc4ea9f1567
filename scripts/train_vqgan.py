"""VQGAN-VAE training entry point (latent-diffusion stage 0).

NEW capability beyond the reference: it imports dalle2-pytorch's VQGanVAE
(/root/reference/dalle2_video/dalle2_video.py:14) but only ever constructs
NullVQGanVAE — the adversarial VAE training stage itself never shipped.
This script trains models/vqvae.py with the taming-style recipe
(train/vqgan_trainer.py) so VideoDecoder's latent hooks have a real VAE.

    python scripts/train_vqgan.py [configs/celebv_text.yaml] [key=value ...]
    python scripts/train_vqgan.py smoke=true platform=cpu
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from dalle2_video_tpu.data import BatchLoader, CelebVTextDataset, split_indices
    from dalle2_video_tpu.models.discriminator import PatchDiscriminator
    from dalle2_video_tpu.models.vqvae import VQVAE
    from dalle2_video_tpu.train.checkpoint import RollingCheckpointManager
    from dalle2_video_tpu.train.vqgan_trainer import (
        VQGanTrainer,
        VQGanTrainerConfig,
        VQGanTrainState,
    )
    from dalle2_video_tpu.utils import MetricsLogger, config_from_argv
    from dalle2_video_tpu.utils.config import setup_platform

    cfg = config_from_argv("configs/celebv_text.yaml")
    logging.basicConfig(level=cfg.get("log_level", "INFO"))
    setup_platform(cfg)
    log = logging.getLogger("train_vqgan")

    vq = cfg.get("vqgan", {})
    smoke = bool(cfg.get("smoke", False))
    if smoke:
        vq = dict(vq)
        vq.update(batch_size=2, epochs=2, frame_size=16, frames=2,
                  base_dim=8, latent_dim=4, num_down=1, codebook_size=32,
                  disc_start=2, disc_base_dim=8, disc_layers=1)
        rng_np = np.random.RandomState(0)
        videos_np = rng_np.rand(8, 2, 16, 16, 3).astype(np.float32)

        class _SynthDS:
            def __len__(self):
                return 8

            def batch_items(self, idx):
                return {"videos": videos_np[idx]}

        ds = _SynthDS()
    else:
        ds = CelebVTextDataset(videos_path=cfg["videos"]["preprocessed"])

    splits = split_indices(len(ds), cfg["train_ratio"], cfg["seed"])
    bs = vq.get("batch_size", 8)
    train_loader = BatchLoader(ds, bs, splits["train"], shuffle=True,
                               seed=cfg["seed"])
    val_loader = BatchLoader(ds, bs, splits["val"], shuffle=False)

    vae = VQVAE(
        latent_dim=vq.get("latent_dim", 4),
        base_dim=vq.get("base_dim", 64),
        num_down=vq.get("num_down", 2),
        codebook_size=vq.get("codebook_size", 512),
        # EMA codebook updates (models/vqvae.ema_codebook_update) — opt-in
        codebook_ema=bool(vq.get("codebook_ema", False)),
        ema_decay=float(vq.get("codebook_ema_decay", 0.99)),
    )
    disc = PatchDiscriminator(
        base_dim=vq.get("disc_base_dim", 64),
        num_layers=vq.get("disc_layers", 3),
    )
    trainer = VQGanTrainer(
        vae, disc,
        VQGanTrainerConfig(
            lr_g=vq.get("lr_g", 1e-4), lr_d=vq.get("lr_d", 1e-4),
            disc_start=vq.get("disc_start", 1000),
            disc_weight=vq.get("disc_weight", 0.8),
            perceptual_weight=vq.get("perceptual_weight", 1.0),
        ),
    )
    state = trainer.init_state(
        jax.random.PRNGKey(cfg["seed"]),
        frame_size=vq.get("frame_size", 64), frames=vq.get("frames", 4),
    )
    step = jax.jit(trainer.train_step)
    eval_fn = jax.jit(trainer.eval_recon)

    mlog = MetricsLogger(cfg["run_dir"], f"vqgan_{cfg['train_name']}",
                         cfg["use_wandb"], cfg)
    ckpt_dir = Path(cfg["run_dir"]) / f"vqgan_{cfg['train_name']}"
    ckpt_mgr = RollingCheckpointManager(
        str(ckpt_dir), max_to_keep=int(cfg.get("ckpt_keep", 3)),
        best_k=1, metric_key="val_loss",
    )
    gstep = 0
    start_epoch = 0
    if bool(cfg.get("resume", False)) and ckpt_mgr.latest_step() is not None:
        state = ckpt_mgr.restore_latest(state)
        gstep = int(ckpt_mgr.latest_step())
        spe = max(len(splits["train"]) // bs, 1)
        start_epoch = gstep // spe
        log.info("resumed vqgan from step %d (epoch %d)", gstep, start_epoch)

    for epoch in range(start_epoch, vq.get("epochs", 10)):
        epoch_metrics = []
        for batch in train_loader:
            state, metrics = step(state, jnp.asarray(batch["videos"]))
            gstep += 1
            epoch_metrics.append(metrics)  # on device; one sync per epoch
            mlog.heartbeat()
        if epoch_metrics:  # epoch-mean logging (not last-batch noise)
            mlog.log(
                {f"train/{k}": float(jnp.mean(jnp.stack(
                    [m[k] for m in epoch_metrics])))
                 for k in epoch_metrics[0]},
                step=gstep)

        vals = []
        for batch in val_loader:
            vals.append(eval_fn(state, jnp.asarray(batch["videos"])))
        metrics = None
        if vals:
            mean = {k: float(np.mean([float(v[k]) for v in vals]))
                    for k in vals[0]}
            mlog.log(mean, step=gstep)
            metrics = {"val_loss": mean["val/rec_l1"]}
        # newest checkpoint every epoch; val only gates best/. FULL
        # VQGanTrainState (both optimizers, disc, step) so resume=true
        # continues training; consumers wanting just the VAE read
        # state.vae_params from the restored tree
        if ckpt_mgr.latest_step() != gstep:
            ckpt_mgr.save(gstep, state, metrics=metrics)
        log.info("epoch %d done (val rec_l1 %.4f)", epoch,
                 mean["val/rec_l1"] if vals else float("nan"))

    ckpt_mgr.close()
    mlog.close()


if __name__ == "__main__":
    main()
