"""Stage-3 entry point: train the cascaded video decoder.

Rebuild of reference ``train_decoder.py``: two-unet cascade (base 64px +
spatial SR 128px), both unets trained each batch, val pass, async rolling
checkpoints (newest-K + best-by-val) — with GSPMD data-parallel sharding
instead of accelerate/DeepSpeed. Usage:

    python scripts/train_decoder.py [configs/celebv_text.yaml] [key=value ...]
    python scripts/train_decoder.py smoke=true        # synthetic-data smoke run
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build_decoder(cfg):
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig

    def unet_cfg(section):
        return UNet3DConfig(
            dim=section["dim"],
            dim_mults=tuple(section["dim_mults"]),
            num_resnet_blocks=section.get("num_resnet_blocks", 2),
            attn_heads=section.get("attn_heads", 16),
            attn_dim_head=section.get("attn_dim_head", 32),
            # flash beats XLA in the full train step once the joint t*h*w
            # bottleneck grows past ~4k tokens (probe21: 89.0 vs 97.0 ms at
            # the 90-frame SR stage) and is the ONLY option at 23k
            attention_impl=section.get("attention_impl", "xla"),
            # v5e capacity knobs for big-activation SR stages
            # (configs/cascade_sr.yaml unet2; r4 remat sweep ledger)
            memory_efficient=section.get("memory_efficient", False),
            checkpoint_during_training=section.get(
                "checkpoint_during_training", False),
            remat_policy=section.get("remat_policy", "nothing"),
            video_embed_dim=cfg["dim"],
            channels=cfg["channels"],
        )

    return VideoDecoder(
        VideoDecoderConfig(
            unets=(unet_cfg(cfg["unet1"]), unet_cfg(cfg["unet2"])),
            frame_sizes=tuple(cfg["frame_sizes"]),
            frame_numbers=tuple(cfg["frame_numbers"]),
            channels=cfg["channels"],
            timesteps=cfg["timesteps"],
            sample_timesteps=cfg.get("sample_timesteps"),
            learned_variance=cfg.get("learned_variance", False),
            # bf16 denoiser forward at sample time (diffusion math stays f32).
            # No script-side default: absent key = None = f32 reference
            # parity (VideoDecoderConfig default); the shipped yaml opts in
            # to bfloat16 explicitly (configs/celebv_text.yaml).
            sample_compute_dtype=cfg.get("sample_compute_dtype"),
            # few-step sampler: "ddim" (default) or "dpmpp"
            # (DPM-Solver++(2M) — second-order, ~4x fewer steps at equal
            # quality; see engine/decoder.p_sample_loop_dpmpp)
            sampler=cfg.get("sampler", "ddim"),
            # CFG rescale phi (Lin et al. 2023); 0 = off (reference parity)
            cfg_rescale=float(cfg.get("cfg_rescale", 0.0)),
        )
    )


def build_trainer(cfg, decoder):
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig, EMAConfig

    tc = cfg["decoder_trainer"]
    return DecoderTrainer(
        decoder,
        DecoderTrainerConfig(
            lr=tc["lr"],
            wd=tc["wd"],
            use_ema=tc["use_ema"],
            ema=EMAConfig(
                beta=tc["ema_beta"],
                update_after_step=tc["ema_update_after_step"],
                update_every=tc["ema_update_every"],
            ),
            max_grad_norm=tc["max_grad_norm"],
            bf16_compute=cfg["decoder"].get("bf16_compute", True),
            grad_accum=tc.get("grad_accum", 1),
        ),
    )


def main() -> None:
    from dalle2_video_tpu.data import BatchLoader, CelebVTextDataset, split_indices
    from dalle2_video_tpu.parallel import create_mesh, shard_batch, shard_with
    from dalle2_video_tpu.parallel.sharded import make_sharded_train_step, shard_state
    from dalle2_video_tpu.utils import MetricsLogger, config_from_argv

    cfg = config_from_argv("configs/celebv_text.yaml")
    logging.basicConfig(level=cfg.get("log_level", "INFO"))
    from dalle2_video_tpu.utils.config import setup_platform

    setup_platform(cfg)
    from dalle2_video_tpu.parallel.mesh import maybe_init_distributed

    # multi-host: opt-in via multihost=true (jax.distributed coordination
    # over DCN; the loaders then shard per process below)
    maybe_init_distributed(bool(cfg.get("multihost", False)))
    log = logging.getLogger("train_decoder")

    smoke = bool(cfg.get("smoke", False))
    n_dev = len(jax.devices())
    # batch must divide the data mesh axis
    bs = n_dev if smoke else cfg["decoder"]["batch_size"]
    epochs = 1 if smoke else cfg["decoder"]["epochs"]

    if smoke:
        # synthetic embeddings + videos (SURVEY.md §7.5: synthetic first)
        cfg["frame_sizes"] = [16, 32]
        cfg["frame_numbers"] = [2, 2]
        cfg["unet1"] = {"dim": 16, "dim_mults": [1, 2], "num_resnet_blocks": 1,
                        "attn_heads": 2, "attn_dim_head": 8}
        cfg["unet2"] = {"dim": 8, "dim_mults": [1, 2], "num_resnet_blocks": 1,
                        "attn_heads": 2, "attn_dim_head": 8}
        n = 2 * bs
        rng = np.random.RandomState(0)
        videos = rng.rand(n, 2, 32, 32, 3).astype(np.float32)
        embeds = rng.randn(n, cfg["dim"]).astype(np.float32)

        class _SynthDS:
            def __len__(self):
                return n

            def batch_items(self, idx):
                return {"videos": videos[idx], "video_embeds": embeds[idx]}

        ds = _SynthDS()
        splits = {"train": np.arange(bs), "val": np.arange(bs, 2 * bs)}
    else:
        ds = CelebVTextDataset(
            video_embeds_path=cfg["videos"]["embed"],
            videos_path=cfg["videos"]["preprocessed"],
        )
        splits = split_indices(len(ds), cfg["train_ratio"], cfg["seed"])

    # per-process data sharding: each host reads a disjoint slice and
    # contributes bs/process_count samples to the global batch
    proc, nproc = jax.process_index(), jax.process_count()
    assert bs % nproc == 0, f"batch {bs} not divisible by {nproc} hosts"
    if str(cfg.get("loader", "thread")) == "grain" and not smoke:
        # production loader: grain worker PROCESSES do the h5/.vshard reads
        # (data/grain_pipeline.py); one DataLoader per epoch so the seeded
        # reshuffle matches BatchLoader's seed+epoch behavior
        from dalle2_video_tpu.data.grain_pipeline import make_grain_loader

        workers = int(cfg.get("loader_workers", 4))

        class _GrainEpochs:
            def __init__(self, indices, shuffle):
                self.indices, self.shuffle, self.epoch = indices, shuffle, 0

            def __iter__(self):
                loader = make_grain_loader(
                    ds, bs // nproc, self.indices, shuffle=self.shuffle,
                    seed=cfg["seed"] + self.epoch, num_epochs=1,
                    shard_index=proc, num_shards=nproc,
                    worker_count=workers,
                )
                self.epoch += 1
                return iter(loader)

        train_loader = _GrainEpochs(splits["train"], True)
        val_loader = _GrainEpochs(splits["val"], False)
    else:
        train_loader = BatchLoader(
            ds, bs // nproc, splits["train"], shuffle=True, seed=cfg["seed"],
            shard_index=proc, num_shards=nproc,
        )
        val_loader = BatchLoader(
            ds, bs // nproc, splits["val"], shuffle=False,
            shard_index=proc, num_shards=nproc,
        )

    decoder = build_decoder(cfg)
    trainer = build_trainer(cfg, decoder)

    mesh_cfg = cfg.get("mesh", {})
    model_ax = mesh_cfg.get("model", 1)
    n_dev = len(jax.devices())
    mesh = create_mesh(data=n_dev // model_ax, model=model_ax)
    log.info("mesh: %s over %d devices", dict(mesh.shape), n_dev)

    rng = jax.random.PRNGKey(cfg["seed"])
    state = shard_state(trainer.init_state(rng), mesh)

    # crash recovery: resume=true reloads the newest rolling checkpoint
    # (replaces the reference's manual-restart + trainer.load flow,
    # SURVEY.md §5 failure-detection entry)
    ckpt_dir = Path(cfg["run_dir"]) / f"decoder_{cfg['train_name']}"
    from dalle2_video_tpu.train.checkpoint import (
        PreemptionGuard,
        RollingCheckpointManager,
        has_checkpoint,
        load_latest,
    )

    if bool(cfg.get("resume", False)) and has_checkpoint(str(ckpt_dir)):
        state = load_latest(str(ckpt_dir), state)
        log.info("resumed from %s at steps %s", ckpt_dir,
                 np.asarray(state.steps))
    # async rolling saves: newest-K + best-1 by val loss, background
    # serialization (RollingCheckpointManager; legacy last/best layouts
    # remain readable via the load_* helpers)
    ckpt_mgr = RollingCheckpointManager(
        str(ckpt_dir),
        max_to_keep=int(cfg.get("ckpt_keep", 3)),
        best_k=1,
        metric_key="val_loss",
        # optional archival class: every Nth step kept permanently
        keep_period=(int(cfg["ckpt_keep_period"])
                     if cfg.get("ckpt_keep_period") else None),
    )
    steps = {
        u: make_sharded_train_step(trainer, mesh, u, donate_state=False)
        for u in (1, 2)
    }
    # optional multi-step fusion: steps_per_scan>1 runs K optimizer steps in
    # ONE compiled dispatch (lax.scan), amortizing dispatch overhead
    steps_per_scan = int(cfg.get("decoder_trainer", {}).get("steps_per_scan", 1))
    if steps_per_scan > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dalle2_video_tpu.parallel.sharded import make_sharded_train_steps_scan

        scan_steps = {
            u: make_sharded_train_steps_scan(trainer, mesh, u, donate_state=False)
            for u in (1, 2)
        }
        scan_sh = NamedSharding(mesh, P(None, "data"))
    eval_losses = {
        u: jax.jit(lambda s, r, v, e, u=u: trainer.eval_loss(
            s, r, v, video_embed=e, unet_number=u))
        for u in (1, 2)
    }

    mlog = MetricsLogger(cfg["run_dir"], f"decoder_{cfg['train_name']}",
                         cfg["use_wandb"], cfg)
    key = rng
    # SIGTERM -> flag; polled at batch boundaries below. An evicted run
    # emergency-saves and exits 143 so run_elastic.py resumes it.
    guard = PreemptionGuard()

    for epoch in range(epochs):
        # epoch-MEAN train losses (reference logs epoch means,
        # train_clip.py:172-191 — not last-batch noise)
        train_sums = {1: [], 2: []}
        if steps_per_scan > 1:
            # accumulate K batches, dispatch one fused K-step program
            pending = []
            for batch in train_loader:
                if guard.preempted:
                    break
                pending.append(batch)
                if len(pending) < steps_per_scan:
                    continue
                vids = jnp.stack([jnp.asarray(b["videos"]) for b in pending])
                embs = jnp.stack([jnp.asarray(b["video_embeds"]) for b in pending])
                pending.clear()
                # (K, B, ...): batch axis 1 on 'data' (multihost-aware)
                vid, emb = shard_with(mesh, scan_sh, (vids, embs))
                for u in (1, 2):
                    key, k = jax.random.split(key)
                    state, losses_k = scan_steps[u](state, k, vid, emb)
                    train_sums[u].append(losses_k)  # (K,) stays on device
                mlog.heartbeat()
            # tail batches (< K) go through the single-step path — but NOT
            # on preemption: the single-step programs may be uncompiled in
            # a scan-mode run (3-20 min remote compile) and would spend the
            # eviction grace period before emergency_save below
            for batch in pending:
                if guard.preempted:
                    break
                vid, emb = shard_batch(
                    mesh,
                    (jnp.asarray(batch["videos"]), jnp.asarray(batch["video_embeds"])),
                )
                for u in (1, 2):
                    key, k = jax.random.split(key)
                    state, loss = steps[u](state, k, vid, emb)
                    train_sums[u].append(loss)
        else:
            for batch in train_loader:
                if guard.preempted:
                    break
                vid, emb = shard_batch(
                    mesh,
                    (jnp.asarray(batch["videos"]), jnp.asarray(batch["video_embeds"])),
                )
                # both unets trained each batch (reference train_decoder.py:127-138).
                # Losses stay ON DEVICE here: a per-step float(loss) round-trips
                # the tunnel (2-4 s/step under load — the r2 ref-recipe curve
                # ran 10x slower than its benched device step); the single
                # device_get at epoch end drains the dispatch queue once.
                for u in (1, 2):
                    key, k = jax.random.split(key)
                    state, loss = steps[u](state, k, vid, emb)
                    train_sums[u].append(loss)
                mlog.heartbeat()
        if guard.preempted:
            guard.emergency_save(ckpt_mgr, int(state.steps[0]), state)
            mlog.close()
            ckpt_mgr.close()
            raise SystemExit(PreemptionGuard.EXIT_CODE)
        if train_sums[1]:
            means = jax.device_get(
                [jnp.mean(jnp.concatenate(
                    [jnp.atleast_1d(l) for l in train_sums[u]]))
                 for u in (1, 2)]
            )  # ONE host sync per epoch
            mlog.log(
                {
                    "train/loss_unet1": float(means[0]),
                    "train/loss_unet2": float(means[1]),
                },
                step=int(state.steps[0]),
            )

        val_sums = {1: [], 2: []}
        for batch in val_loader:
            # multihost-aware placement (each host passes its loader shard);
            # raw process-local arrays next to a mesh-committed state would
            # fail on a multi-process mesh
            vid, emb = shard_batch(
                mesh,
                (jnp.asarray(batch["videos"]), jnp.asarray(batch["video_embeds"])),
            )
            for u in (1, 2):
                key, k = jax.random.split(key)
                val_sums[u].append(eval_losses[u](state, k, vid, emb))
        metrics = None
        if val_sums[1]:
            v1, v2 = (
                float(jnp.mean(jnp.stack(val_sums[u]))) for u in (1, 2)
            )
            mlog.log({"val/loss_unet1": v1, "val/loss_unet2": v2},
                     step=int(state.steps[0]))
            # summed val loss selects best (reference train_decoder.py:177-184)
            metrics = {"val_loss": float(v1 + v2)}
        step_now = int(state.steps[0])
        # newest checkpoint EVERY epoch (reference saves decoder_last each
        # epoch; val only gates the best/ copy)
        if ckpt_mgr.latest_step() != step_now:  # zero-batch epoch guard
            ckpt_mgr.save(step_now, state, metrics=metrics)
        log.info("epoch %d done", epoch)

    ckpt_mgr.close()
    mlog.close()
    log.info("training complete")


if __name__ == "__main__":
    main()
