"""Stage-1 entry point: train the video-CLIP (ViViT) tower.

Rebuild of reference ``train_clip.py``: seeded 80/20 split shared across
stages, frozen text tower, ViViT + CLIPLoss + retrieval metrics, best/last
checkpoints. Usage:

    python scripts/train_clip.py [configs/celebv_text.yaml] [key=value ...]
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
    from dalle2_video_tpu.models.vivit import ViViTConfig
    from dalle2_video_tpu.train.checkpoint import RollingCheckpointManager
    from dalle2_video_tpu.train.clip_trainer import ClipTrainer, ClipTrainerConfig
    from dalle2_video_tpu.utils import MetricsLogger, config_from_argv

    cfg = config_from_argv("configs/celebv_text.yaml")
    logging.basicConfig(level=cfg.get("log_level", "INFO"))
    from dalle2_video_tpu.utils.config import setup_platform

    setup_platform(cfg)
    log = logging.getLogger("train_clip")

    smoke = bool(cfg.get("smoke", False))
    if smoke:
        # synthetic CLIP-stage corpus (tokens + videos), tiny tower
        cfg["video_encoder"] = {"frame_size": 32, "patch_size": 16,
                                "num_frames": 25, "dim": 32, "depth": 1,
                                "heads": 2, "dim_head": 8}
        cfg["clip"]["batch_size"] = 4
        cfg["clip"]["epochs"] = 2
        rng_np = np.random.RandomState(0)
        videos_np = rng_np.rand(16, 25, 32, 32, 3).astype(np.float32)
        tokens_np = rng_np.randint(1, 1000, (16, 77)).astype(np.int32)

        class _SynthDS:
            def __len__(self):
                return 16

            def batch_items(self, idx):
                return {"videos": videos_np[idx], "texts": tokens_np[idx]}

        ds = _SynthDS()
    else:
        ds = CelebVTextDataset(
            texts_path=cfg["texts"]["tokenized"],
            videos_path=cfg["videos"]["preprocessed"],
        )
    splits = split_indices(len(ds), cfg["train_ratio"], cfg["seed"])
    bs = cfg["clip"]["batch_size"]
    train_loader = BatchLoader(ds, bs, splits["train"], shuffle=True, seed=cfg["seed"])
    val_loader = BatchLoader(ds, bs, splits["val"], shuffle=False)

    ve = cfg["video_encoder"]
    vivit_cfg = ViViTConfig(
        frame_size=ve["frame_size"], patch_size=ve["patch_size"],
        num_frames=ve["num_frames"], dim=ve["dim"], depth=ve["depth"],
        heads=ve["heads"], dim_head=ve["dim_head"],
        dropout=float(ve.get("dropout", 0.0)),
        emb_dropout=float(ve.get("emb_dropout", 0.0)),
    )
    from dalle2_video_tpu.models.clip_text import CLIPTextConfig

    text_cfg = CLIPTextConfig(embed_dim=ve["dim"])
    if smoke:
        text_cfg = CLIPTextConfig(vocab_size=1000, width=32, heads=2, layers=1,
                                  embed_dim=ve["dim"])
    epochs = cfg["clip"]["epochs"]
    trainer = ClipTrainer(
        vivit_cfg,
        text_cfg,
        cfg=ClipTrainerConfig(
            lr=cfg["clip"]["lr"],
            lr_scheduler=cfg["clip"]["lr_scheduler"],
            lr_multistep_milestones=tuple(cfg["clip"]["lr_multistep_milestones"]),
            lr_step_gamma=cfg["clip"]["lr_step_gamma"],
            total_steps=max(1, len(train_loader)) * epochs,
            init_temperature=cfg["clip"]["init_temperature"],
        ),
    )

    # key hygiene: independent keys for ViViT init, text-tower init, and
    # the training dropout stream (one shared key correlates the draws).
    # MUST come from clip_stage_keys — eval_clip derives the SAME frozen
    # text tower from it (round-4 bug: diverging derivations scored
    # full-dataset retrieval at exact chance).
    from dalle2_video_tpu.train.clip_trainer import clip_stage_keys

    k_vivit, k_text, rng = clip_stage_keys(cfg["seed"])
    sample = next(iter(train_loader))
    videos0 = jnp.asarray(sample["videos"])
    state = trainer.init_state(k_vivit, videos0[:1])
    if cfg.get("torch_vivit_ckpt"):
        # warm-start from a reference torch video_encoder_{last,best}.pt
        # (fresh optimizer state; import proven in tests/test_torch_import.py)
        import dataclasses as _dc

        from dalle2_video_tpu.models.torch_import import load_vivit_torch_ckpt

        state = _dc.replace(
            state,
            vivit_params=load_vivit_torch_ckpt(
                str(cfg["torch_vivit_ckpt"]),
                trainer.vivit.cfg,
            ),
        )
        log.info("warm-started ViViT from %s", cfg["torch_vivit_ckpt"])
    text_params = trainer.init_text_params(k_text, cfg["clip"].get("openai_ckpt"))
    if cfg["clip"].get("openai_ckpt") is None:
        log.warning("no OpenAI CLIP ckpt given — text tower is randomly initialized")

    train_step = jax.jit(trainer.train_step)
    eval_step = jax.jit(trainer.eval_step)

    mlog = MetricsLogger(cfg["run_dir"], f"clip_{cfg['train_name']}",
                         cfg["use_wandb"], cfg)
    ckpt_dir = Path(cfg["run_dir"]) / f"clip_{cfg['train_name']}"
    # async rolling saves, newest-K + best-1 by val loss
    ckpt_mgr = RollingCheckpointManager(
        str(ckpt_dir), max_to_keep=int(cfg.get("ckpt_keep", 3)),
        best_k=1, metric_key="val_loss",
    )
    start_epoch = 0
    if bool(cfg.get("resume", False)) and ckpt_mgr.latest_step() is not None:
        state = ckpt_mgr.restore_latest(state)
        start_epoch = int(state.step) // max(len(train_loader), 1)
        log.info("resumed clip from step %d (epoch %d)",
                 int(state.step), start_epoch)

    for epoch in range(start_epoch, epochs):
        # epoch-MEAN metrics (reference logs epoch means, train_clip.py:172-191)
        train_metrics = []
        for batch in train_loader:
            rng, k_drop = jax.random.split(rng)
            state, metrics = train_step(
                state, text_params,
                jnp.asarray(batch["videos"]), jnp.asarray(batch["texts"]),
                k_drop,  # dropout rng (inert when dropout is 0)
            )
            train_metrics.append(metrics)  # on device; one sync per epoch
            mlog.heartbeat()
        if train_metrics:
            mlog.log(
                {f"train/{k}": float(jnp.mean(jnp.stack(
                    [m[k] for m in train_metrics])))
                 for k in train_metrics[0]},
                step=int(state.step),
            )

        val_metrics = []
        for batch in val_loader:
            m = eval_step(state, text_params,
                          jnp.asarray(batch["videos"]), jnp.asarray(batch["texts"]))
            val_metrics.append({k: float(v) for k, v in m.items()})
        metrics = None
        if val_metrics:
            agg = {f"val/{k}": float(np.mean([m[k] for m in val_metrics]))
                   for k in val_metrics[0]}
            mlog.log(agg, step=int(state.step))
            metrics = {"val_loss": agg["val/loss"]}
        # newest checkpoint saved EVERY epoch (reference saves *_last each
        # epoch, train_clip.py:195-199 — val only gates the best/ copy);
        # tiny corpora whose val split has no full batch still checkpoint
        if ckpt_mgr.latest_step() != int(state.step):
            ckpt_mgr.save(int(state.step), state, metrics=metrics)
        log.info("epoch %d done", epoch)

    ckpt_mgr.close()
    mlog.close()


if __name__ == "__main__":
    main()
