"""Stage-2 entry point: train the diffusion prior (text-embed -> video-embed).

NEW capability: the reference repo has the dataset mode and inference hook
for the prior (datasets.py:75-79, dalle2_video.py:2347) but no training
script. Usage:

    python scripts/train_prior.py [configs/celebv_text.yaml] [key=value ...]
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main() -> None:
    from dalle2_video_tpu.data import BatchLoader, CelebVTextDataset, split_indices
    from dalle2_video_tpu.models.prior import prior_from_config
    from dalle2_video_tpu.train.checkpoint import RollingCheckpointManager
    from dalle2_video_tpu.utils import MetricsLogger, config_from_argv

    cfg = config_from_argv("configs/celebv_text.yaml")
    logging.basicConfig(level=cfg.get("log_level", "INFO"))
    from dalle2_video_tpu.utils.config import setup_platform

    setup_platform(cfg)
    log = logging.getLogger("train_prior")

    ds = CelebVTextDataset(
        text_embeds_path=cfg["texts"]["embed"],
        video_embeds_path=cfg["videos"]["embed"],
    )
    splits = split_indices(len(ds), cfg["train_ratio"], cfg["seed"])
    pc = cfg["prior"]
    train_loader = BatchLoader(ds, pc["batch_size"], splits["train"], shuffle=True,
                               seed=cfg["seed"])
    val_loader = BatchLoader(ds, pc["batch_size"], splits["val"], shuffle=False)

    # pipeline parallelism (parallel/pipeline.py): pipeline_microbatches>0
    # pipelines the transformer stack over the mesh's 'model' axis
    # (pipeline_stages devices per pipe; requires the scan_layers param
    # layout, which it implies)
    pipe_mb = int(pc.get("pipeline_microbatches", 0))
    ff_experts = int(pc.get("ff_experts", 0))
    assert not (pipe_mb > 0 and ff_experts > 0), (
        "pipeline and expert parallelism both consume the mesh's 'model' "
        "axis — enable one per run (models/moe.py)"
    )
    prior = prior_from_config(cfg)
    rng = jax.random.PRNGKey(cfg["seed"])
    params = prior.init_params(rng)
    optimizer = optax.adam(pc["lr"])
    opt_state = optimizer.init(params)

    # EMA shadow prior (inherited DiffusionPriorTrainer capability —
    # dalle2-pytorch samples with the EMA prior; load_params_subtree prefers
    # the shadow). Opt-in: adding the shadow changes the checkpoint
    # structure, so old runs keep resuming cleanly.
    from dalle2_video_tpu.train.ema import EMAConfig, ema_init, ema_update

    use_ema = bool(pc.get("use_ema", False))
    ema_cfg = EMAConfig(
        beta=float(pc.get("ema_beta", 0.99)),
        update_after_step=int(pc.get("ema_update_after_step", 100)),
        update_every=int(pc.get("ema_update_every", 10)),
    )
    ema = ema_init(params) if use_ema else None

    mesh = None
    sharding_tree = None
    if pipe_mb > 0:
        from dalle2_video_tpu.parallel.mesh import create_mesh
        from dalle2_video_tpu.parallel.pipeline import pipeline_sharding_tree

        stages = int(pc.get("pipeline_stages", len(jax.devices())))
        mesh = create_mesh(model=stages)
        log.info("pipeline parallelism: %d stages x %d data, %d microbatches",
                 stages, mesh.shape["data"], pipe_mb)
        sharding_tree = lambda t: pipeline_sharding_tree(t, mesh)
    elif ff_experts > 0:
        from dalle2_video_tpu.models.moe import moe_sharding_tree
        from dalle2_video_tpu.parallel.mesh import create_mesh

        ep = int(pc.get("expert_parallel", len(jax.devices())))
        mesh = create_mesh(model=ep)
        log.info("expert parallelism: %d experts over %d-way 'model' axis",
                 ff_experts, ep)
        sharding_tree = lambda t: moe_sharding_tree(t, mesh)

    if sharding_tree is not None:
        # place every training-state tree consistently: layer/expert shards
        # on their stages, everything else (incl. the EMA step counter)
        # replicated — mixed placements would fail at the jit boundary
        place = lambda t: jax.tree_util.tree_map(
            jax.device_put, t, sharding_tree(t))
        params, opt_state = place(params), place(opt_state)
        if ema is not None:
            ema = place(ema)

    def _loss(p, key, ve, te):
        if mesh is None:
            return prior.loss(p, key, ve, te)
        from dalle2_video_tpu.parallel.mesh import active_mesh

        with active_mesh(mesh):  # trace-time mesh discovery (house style)
            return prior.loss(p, key, ve, te)

    @jax.jit
    def step(params, opt_state, ema, key, ve, te):
        loss, grads = jax.value_and_grad(
            lambda p: _loss(p, key, ve, te)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema is not None:
            ema = ema_update(ema, params, ema_cfg)
        return params, opt_state, ema, loss

    eval_loss = jax.jit(lambda p, key, ve, te: _loss(p, key, ve, te))

    mlog = MetricsLogger(cfg["run_dir"], f"prior_{cfg['train_name']}",
                         cfg["use_wandb"], cfg)
    ckpt_dir = Path(cfg["run_dir"]) / f"prior_{cfg['train_name']}"
    ckpt_mgr = RollingCheckpointManager(
        str(ckpt_dir), max_to_keep=int(cfg.get("ckpt_keep", 3)),
        best_k=1, metric_key="val_loss",
    )
    key = rng
    gstep = 0
    start_epoch = 0
    if bool(cfg.get("resume", False)) and ckpt_mgr.latest_step() is not None:
        template = {"params": params, "opt_state": opt_state}
        if use_ema:
            template["ema"] = ema
        restored = ckpt_mgr.restore_latest(template)
        params, opt_state = restored["params"], restored["opt_state"]
        ema = restored.get("ema", ema)
        gstep = int(ckpt_mgr.latest_step())
        spe = max(len(splits["train"]) // pc["batch_size"], 1)
        start_epoch = gstep // spe
        log.info("resumed prior from step %d (epoch %d)", gstep, start_epoch)

    for epoch in range(start_epoch, pc["epochs"]):
        epoch_losses = []
        for batch in train_loader:
            key, k = jax.random.split(key)
            params, opt_state, ema, loss = step(
                params, opt_state, ema, k,
                jnp.asarray(batch["video_embeds"]), jnp.asarray(batch["text_embeds"]),
            )
            epoch_losses.append(loss)  # on device; one sync per epoch below
            gstep += 1
            mlog.heartbeat()
        # epoch-MEAN loss (matches reference epoch-mean logging, not
        # last-batch noise — reference train_clip.py:172-191 pattern)
        if epoch_losses:
            mlog.log({"train/loss": float(jnp.mean(jnp.stack(epoch_losses)))},
                     step=gstep)

        vals = []
        for batch in val_loader:
            key, k = jax.random.split(key)
            vals.append(float(eval_loss(
                params, k,
                jnp.asarray(batch["video_embeds"]), jnp.asarray(batch["text_embeds"]),
            )))
        metrics = None
        if vals:
            v = float(np.mean(vals))
            mlog.log({"val/loss": v}, step=gstep)
            metrics = {"val_loss": v}
        # newest checkpoint every epoch; val only gates best/ (reference
        # saves *_last each epoch). FULL training state so resume=true
        # restores the optimizer too (consumers read just the params via
        # load_params_subtree, which also accepts the old bare layout)
        if ckpt_mgr.latest_step() != gstep:
            state_out = {"params": params, "opt_state": opt_state}
            if use_ema:
                state_out["ema"] = ema
            ckpt_mgr.save(gstep, state_out, metrics=metrics)
        log.info("epoch %d done", epoch)

    ckpt_mgr.close()
    mlog.close()


if __name__ == "__main__":
    main()
