"""Trainer + EMA + sharded-step tests (SURVEY.md §4, item 4: multi-device
via the 8-virtual-device CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
from dalle2_video_tpu.models import UNet3DConfig
from dalle2_video_tpu.parallel import create_mesh, shard_batch
from dalle2_video_tpu.parallel.sharded import make_sharded_train_step, shard_state
from dalle2_video_tpu.train import (
    DecoderTrainer,
    DecoderTrainerConfig,
    EMAConfig,
    ema_init,
    ema_update,
)

B, T, S, EMB = 4, 2, 8, 16


def tiny_decoder(**kw):
    u = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=EMB,
        init_cross_embed=False, init_conv_ksize=3,
    )
    base = dict(
        unets=(u,), frame_sizes=(S,), frame_numbers=(T,),
        timesteps=10, learned_variance=False,
    )
    base.update(kw)
    return VideoDecoder(VideoDecoderConfig(**base))


@pytest.fixture(scope="module")
def trainer_and_state():
    dec = tiny_decoder()
    trainer = DecoderTrainer(
        dec,
        DecoderTrainerConfig(
            lr=1e-3, warmup_steps=5, use_ema=True,
            ema=EMAConfig(beta=0.99, update_after_step=2, update_every=1),
        ),
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    return trainer, state


def batch(rng=1):
    video = jax.random.uniform(jax.random.PRNGKey(rng), (B, T, S, S, 3))
    emb = jax.random.normal(jax.random.PRNGKey(rng + 100), (B, EMB))
    return video, emb


def test_train_step_updates_params_and_decreases_nothing_nan(trainer_and_state):
    trainer, state = trainer_and_state
    video, emb = batch()
    state2, loss = trainer.train_step(
        state, jax.random.PRNGKey(1), video, video_embed=emb
    )
    assert np.isfinite(float(loss))
    assert int(state2.steps[0]) == 1
    # NOTE: to_out is zero-init, so on step 1 only to_out (and wd-decayed
    # kernels) can move — gradient reaches the rest from step 2 on.
    state3, _ = trainer.train_step(
        state2, jax.random.PRNGKey(2), video, video_embed=emb
    )
    before = jax.tree_util.tree_leaves(state.params["unet_0"])
    after = jax.tree_util.tree_leaves(state3.params["unet_0"])
    changed = sum(float(jnp.abs(a - b).max()) > 0 for a, b in zip(after, before))
    assert changed > len(before) * 3 // 4


def test_loss_decreases_over_steps(trainer_and_state):
    trainer, state = trainer_and_state
    video, emb = batch()
    step = jax.jit(
        lambda s, r: trainer.train_step(s, r, video, video_embed=emb)
    )
    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(30):
        key, k = jax.random.split(key)
        state, loss = step(state, k)
        losses.append(float(loss))
    # fixed batch, small net: loss must trend down
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_grad_accum_matches_manual_microbatch_mean():
    """grad_accum=2 must produce EXACTLY the params of manually averaging
    the two microbatch gradients (same per-microbatch PRNG keys) and
    applying the same optimizer update."""
    dec = tiny_decoder()
    tr_acc = DecoderTrainer(dec, DecoderTrainerConfig(use_ema=False, grad_accum=2))
    state = tr_acc.init_state(jax.random.PRNGKey(0))
    video, emb = batch()
    rng = jax.random.PRNGKey(5)

    state2, loss_acc = tr_acc.train_step(state, rng, video, video_embed=emb)

    # manual: same microbatch split + keys as the accum scan
    import optax

    keys = jax.random.split(rng, 2)
    vids = video.reshape(2, B // 2, *video.shape[1:])
    embs = emb.reshape(2, B // 2, emb.shape[-1])

    def loss_fn(unet_params, key, vid, e):
        p = dict(state.params)
        p["unet_0"] = unet_params
        return dec.loss(p, key, vid, video_embed=e, unet_number=1)

    losses, grads = [], []
    for k in range(2):
        l, g = jax.value_and_grad(loss_fn)(
            state.params["unet_0"], keys[k], vids[k], embs[k]
        )
        losses.append(l)
        grads.append(g)
    mean_grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, *grads)
    updates, _ = tr_acc.optimizers[0].update(
        mean_grads, state.opt_states[0], state.params["unet_0"]
    )
    expected = optax.apply_updates(state.params["unet_0"], updates)

    np.testing.assert_allclose(
        float(loss_acc), float((losses[0] + losses[1]) / 2), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(state2.params["unet_0"]),
        jax.tree_util.tree_leaves(expected),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_grad_accum_text_only_conditioning():
    """grad_accum with text_encodings but NO video_embed (previously read
    the text slot from the wrong xs index and crashed). Only SR-stage unets
    can be text-only (unet 1 is always video-embed conditioned), so train
    unet_number=2 of a two-unet cascade."""
    u = lambda **kw: UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=EMB,
        init_cross_embed=False, init_conv_ksize=3, **kw,
    )
    dec = tiny_decoder(
        unets=(u(), u(cond_on_text_encodings=True, text_embed_dim=12, max_text_len=6)),
        frame_sizes=(S, S),
        frame_numbers=(T, T),
    )
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(use_ema=False, grad_accum=2))
    state = trainer.init_state(jax.random.PRNGKey(0))
    video, _ = batch()
    text = jax.random.normal(jax.random.PRNGKey(3), (B, 4, 12))
    state2, loss = trainer.train_step(
        state, jax.random.PRNGKey(5), video, text_encodings=text, unet_number=2
    )
    assert np.isfinite(float(loss))
    assert int(state2.steps[1]) == 1
    # train_steps_scan had the mirror bug: text-only xs failed to unpack
    vids = jnp.stack([video, video])
    txts = jnp.stack([text, text])
    _, losses = trainer.train_steps_scan(
        state, jax.random.PRNGKey(6), vids, text_encodings=txts, unet_number=2
    )
    assert losses.shape == (2,) and np.all(np.isfinite(np.asarray(losses)))


def test_ema_decay_spec():
    cfg = EMAConfig(beta=0.9, update_after_step=3, update_every=1)
    params = {"w": jnp.ones((4, 4))}
    st = ema_init(params)
    online = {"w": jnp.zeros((4, 4))}
    # during warmup (step <= after_step+1): shadow copies online
    for _ in range(4):
        st = ema_update(st, online, cfg)
    np.testing.assert_allclose(np.asarray(st.params["w"]), 0.0)
    # after warmup: geometric blend toward online
    online2 = {"w": jnp.ones((4, 4))}
    st = ema_update(st, online2, cfg)
    v = float(st.params["w"][0, 0])
    assert 0.0 < v < 1.0


def test_ema_update_every_gates():
    cfg = EMAConfig(beta=0.9, update_after_step=0, update_every=10)
    params = {"w": jnp.ones(())}
    st = ema_init(params)
    st = ema_update(st, {"w": jnp.zeros(())}, cfg)  # step 1: gated, no change
    np.testing.assert_allclose(float(st.params["w"]), 1.0)


def test_sampling_params_swaps_ema(trainer_and_state):
    trainer, state = trainer_and_state
    video, emb = batch()
    # EMA copies online params during warmup (update_after_step=2);
    # step past it so the shadow actually lags the online params
    key = jax.random.PRNGKey(1)
    step = jax.jit(lambda s, r: trainer.train_step(s, r, video, video_embed=emb))
    for _ in range(6):
        key, k = jax.random.split(key)
        state, _ = step(state, k)
    p_ema = trainer.sampling_params(state, use_ema=True)
    p_online = trainer.sampling_params(state, use_ema=False)
    l_ema = jax.tree_util.tree_leaves(p_ema["unet_0"])
    l_on = jax.tree_util.tree_leaves(p_online["unet_0"])
    assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(l_ema, l_on))


def test_lr_too_high_asserts():
    dec = tiny_decoder()
    with pytest.raises(AssertionError):
        DecoderTrainer(dec, DecoderTrainerConfig(lr=0.1))


def test_sharded_train_step_8dev(mesh8):
    """DP train step on the virtual 8-device mesh: one step, finite loss,
    same math as single-device."""
    dec = tiny_decoder()
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(use_ema=False))
    state = trainer.init_state(jax.random.PRNGKey(0))
    video, emb = batch()
    # batch 4 over data=4 mesh axis
    sharded = make_sharded_train_step(trainer, mesh8, 1, zero1=True, donate_state=False)
    st = shard_state(state, mesh8)
    vid_s, emb_s = shard_batch(mesh8, (video, emb))
    st2, loss = sharded(st, jax.random.PRNGKey(1), vid_s, emb_s)
    assert np.isfinite(float(loss))
    # single-device reference step with identical rng
    st_ref, loss_ref = trainer.train_step(
        state, jax.random.PRNGKey(1), video, video_embed=emb
    )
    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-4)
    a = jax.tree_util.tree_leaves(st2.params["unet_0"])
    b = jax.tree_util.tree_leaves(st_ref.params["unet_0"])
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)


def test_checkpoint_roundtrip(tmp_path, trainer_and_state):
    from dalle2_video_tpu.train import load_checkpoint, save_checkpoint

    trainer, state = trainer_and_state
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, jax.tree_util.tree_map(lambda x: x, state))
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_sharded(tmp_path, mesh8):
    """Save a MESH-SHARDED train state, restore into sharded abstract target
    (the actual resume=true path under GSPMD), verify shardings + values."""
    from dalle2_video_tpu.train import load_checkpoint, save_checkpoint

    dec = tiny_decoder()
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(use_ema=True))
    state = trainer.init_state(jax.random.PRNGKey(0))
    st_sharded = shard_state(state, mesh8, zero1=True, tp=True, tp_min_width=8)
    # advance one step so opt state / EMA are non-trivial
    video, emb = batch()
    step = make_sharded_train_step(trainer, mesh8, 1, zero1=True, donate_state=False)
    vid_s, emb_s = shard_batch(mesh8, (video, emb))
    st_sharded, _ = step(st_sharded, jax.random.PRNGKey(1), vid_s, emb_s)

    path = str(tmp_path / "sharded_ckpt")
    save_checkpoint(path, st_sharded)

    # restore into an abstract target carrying the SAME shardings
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        if hasattr(x, "sharding") else x,
        st_sharded,
    )
    restored = load_checkpoint(path, abstract)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored),
        jax.tree_util.tree_leaves(st_sharded),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if hasattr(a, "sharding") and hasattr(b, "sharding"):
            assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
    # and the restored state can take another sharded step
    st3, loss = step(restored, jax.random.PRNGKey(2), vid_s, emb_s)
    assert np.isfinite(float(loss))
    assert int(st3.steps[0]) == 2


def test_sharded_clip_train_step(mesh8):
    """Global-batch CLIP step on the virtual mesh: loss finite, params move,
    retrieval metrics emitted."""
    import jax.numpy as jnp

    from dalle2_video_tpu.models.clip_text import CLIPTextConfig
    from dalle2_video_tpu.models.vivit import ViViTConfig
    from dalle2_video_tpu.parallel import shard_batch
    from dalle2_video_tpu.train.clip_trainer import ClipTrainer, ClipTrainerConfig

    vcfg = ViViTConfig(frame_size=16, patch_size=8, num_frames=25, dim=16,
                       depth=1, heads=2, dim_head=8)
    tcfg = CLIPTextConfig(vocab_size=60, context_length=8, width=16, heads=2,
                          layers=1, embed_dim=16)
    trainer = ClipTrainer(vcfg, tcfg, ClipTrainerConfig(lr=1e-3, total_steps=10))
    videos = jax.random.uniform(jax.random.PRNGKey(0), (8, 25, 16, 16, 3))
    tokens = jnp.tile(jnp.array([[1, 5, 59, 0, 0, 0, 0, 0]], jnp.int32), (8, 1))
    state = trainer.init_state(jax.random.PRNGKey(1), videos[:1])
    text_params = trainer.init_text_params(jax.random.PRNGKey(2))
    step = trainer.make_sharded_train_step(mesh8)
    v_s, t_s = shard_batch(mesh8, (videos, tokens))
    state2, metrics = step(state, text_params, v_s, t_s)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    assert "top1" in metrics
    # parity with the unsharded step on identical inputs
    state_ref, metrics_ref = trainer.train_step(state, text_params, videos, tokens)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics_ref["loss"]), rtol=1e-4
    )


def test_tp_sharded_step_matches_dp(mesh8):
    """dp+tp+zero1 sharded step must give the same numbers as plain DP."""
    dec = tiny_decoder()
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(use_ema=False))
    state = trainer.init_state(jax.random.PRNGKey(0))
    video, emb = batch()
    step = make_sharded_train_step(trainer, mesh8, 1, donate_state=False)
    st_tp = shard_state(state, mesh8, zero1=True, tp=True, tp_min_width=8)
    vid_s, emb_s = shard_batch(mesh8, (video, emb))
    st2, loss_tp = step(st_tp, jax.random.PRNGKey(1), vid_s, emb_s)
    _, loss_ref = trainer.train_step(state, jax.random.PRNGKey(1), video,
                                     video_embed=emb)
    np.testing.assert_allclose(float(loss_tp), float(loss_ref), rtol=2e-4)


def test_train_steps_scan_matches_loop(trainer_and_state):
    """K scanned steps == K sequential steps (same keys)."""
    trainer, state = trainer_and_state
    K = 3
    keys = jax.random.split(jax.random.PRNGKey(7), K)
    vids = jnp.stack([batch(i)[0] for i in range(K)])
    embs = jnp.stack([batch(i)[1] for i in range(K)])
    st_scan, losses = trainer.train_steps_scan(
        state, jax.random.PRNGKey(7), vids, video_embeds=embs
    )
    assert losses.shape == (K,)
    st_loop = state
    for i in range(K):
        st_loop, li = trainer.train_step(
            st_loop, keys[i], vids[i], video_embed=embs[i]
        )
        np.testing.assert_allclose(float(losses[i]), float(li), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(st_scan.params["unet_0"]),
        jax.tree_util.tree_leaves(st_loop.params["unet_0"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sequence_parallel_mqa_matches_local(mesh8):
    """Token-sharded flash MQA == single-device reference (exact SP), with
    the replicated null kv prepended after the gather; gradients flow
    through the shard_map + flash custom VJP."""
    from dalle2_video_tpu.parallel.sp_attention import sequence_parallel_mqa

    b, n, h, d = 2, 64, 4, 16  # n divisible by model axis (2)
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(keys[0], (b, n, h, d))
    k = jax.random.normal(keys[1], (b, n, d))
    v = jax.random.normal(keys[2], (b, n, d))
    nk = jax.random.normal(keys[3], (b, 1, d))
    nv = jax.random.normal(keys[4], (b, 1, d))
    scale = d**-0.5

    def local_ref(q_, k_, v_):
        kk = jnp.concatenate([nk, k_], axis=1)
        vv = jnp.concatenate([nv, v_], axis=1)
        sim = jnp.einsum("bnhd,bmd->bhnm", q_ * scale, kk)
        return jnp.einsum("bhnm,bmd->bnhd", jax.nn.softmax(sim, -1), vv)

    got = jax.jit(
        lambda a, b_, c: sequence_parallel_mqa(
            a, b_, c, mesh8, sm_scale=scale, null_kv=(nk, nv))
    )(q, k, v)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(local_ref(q, k, v)), atol=2e-5)

    # gradient parity (the 23k regime is a TRAINING path)
    gsp = jax.jit(jax.grad(lambda a, b_, c: jnp.sum(sequence_parallel_mqa(
        a, b_, c, mesh8, sm_scale=scale, null_kv=(nk, nv)) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    gref = jax.grad(lambda a, b_, c: jnp.sum(local_ref(a, b_, c) ** 2),
                    argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gsp, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4)


def test_unet_sp_attention_trains_on_mesh(mesh8):
    """attention_impl='sp' end to end: the sharded train step (which traces
    under active_mesh) runs with the joint-attention token axis sharded over
    'model', and matches the attention_impl='xla' loss on the same params —
    a scaled-down long-context shape (8 frames -> 512 joint tokens over a
    4x2 mesh). VERDICT r2 #5."""
    import dataclasses

    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.parallel.sharded import make_sharded_train_step, shard_state
    from dalle2_video_tpu.parallel import shard_batch

    unet = UNet3DConfig(
        dim=16, dim_mults=(1, 2), video_embed_dim=32,
        num_resnet_blocks=1, attn_heads=2, attn_dim_head=8,
        attention_impl="sp",
    )
    cfg = VideoDecoderConfig(
        unets=(unet,), frame_sizes=(16,), frame_numbers=(8,),
        timesteps=20, learned_variance=False,
    )
    dec = VideoDecoder(cfg)
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(lr=1e-3, use_ema=False))
    state = shard_state(trainer.init_state(jax.random.PRNGKey(0)), mesh8)
    video = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 16, 16, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (4, 32))
    vid_sh, emb_sh = shard_batch(mesh8, (video, emb))

    step = make_sharded_train_step(trainer, mesh8, 1)
    state2, loss_sp = step(state, jax.random.PRNGKey(3), vid_sh, emb_sh)
    assert np.isfinite(float(loss_sp))
    assert int(state2.steps[0]) == 1

    # same params + rng through the XLA attention path -> same loss
    dec_x = VideoDecoder(dataclasses.replace(
        cfg, unets=(dataclasses.replace(unet, attention_impl="xla"),)))
    trainer_x = DecoderTrainer(dec_x, DecoderTrainerConfig(lr=1e-3, use_ema=False))
    step_x = make_sharded_train_step(trainer_x, mesh8, 1)
    _, loss_x = step_x(state, jax.random.PRNGKey(3), vid_sh, emb_sh)
    np.testing.assert_allclose(float(loss_sp), float(loss_x), rtol=2e-4)


def test_nonfinite_step_skipped():
    """A NaN batch must not move the params (skip_nonfinite guard)."""
    dec = tiny_decoder()
    trainer = DecoderTrainer(dec, DecoderTrainerConfig(use_ema=False))
    state = trainer.init_state(jax.random.PRNGKey(0))
    video, emb = batch()
    bad_video = video.at[0, 0, 0, 0, 0].set(jnp.nan)
    state2, loss = trainer.train_step(
        state, jax.random.PRNGKey(1), bad_video, video_embed=emb
    )
    assert not np.isfinite(float(loss))
    for a, b in zip(
        jax.tree_util.tree_leaves(state2.params["unet_0"]),
        jax.tree_util.tree_leaves(state.params["unet_0"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # step counter still advances (the batch was consumed)
    assert int(state2.steps[0]) == 1


def test_rolling_checkpoint_manager(tmp_path):
    """Async step-indexed saves, retention, best-step restore
    (train/checkpoint.py RollingCheckpointManager, ROADMAP #10)."""
    import jax.numpy as jnp

    from dalle2_video_tpu.train.checkpoint import RollingCheckpointManager

    state = {"w": jnp.arange(4.0), "step": jnp.zeros((), jnp.int32)}
    mgr = RollingCheckpointManager(
        str(tmp_path / "ckpts"), max_to_keep=2, best_k=1, metric_key="val_loss"
    )
    vals = {1: 3.0, 2: 1.0, 3: 2.0, 4: 5.0}
    for step, v in vals.items():
        mgr.save(step, {"w": state["w"] * step, "step": state["step"] + step},
                 metrics={"val_loss": v})
    mgr.wait()
    kept = mgr.all_steps()
    assert len(kept) <= 2, kept  # recency retention (max_to_keep)
    assert mgr.latest_step() == 4  # newest survives even though worst
    latest = mgr.restore_latest(
        {"w": jnp.zeros(4), "step": jnp.zeros((), jnp.int32)}
    )
    assert int(latest["step"]) == 4
    best = mgr.restore_best(
        {"w": jnp.zeros(4), "step": jnp.zeros((), jnp.int32)}
    )
    assert int(best["step"]) == 2  # val_loss 1.0 was the best
    mgr.close()


def test_rolling_checkpoint_best_k_keeps_top_k(tmp_path):
    """best_k=2 must keep the TWO best checkpoints: a step better than the
    k-th best but worse than the best must still be saved (ADVICE r2: the
    old gate compared against the single best and starved slots 2..k)."""
    import jax.numpy as jnp

    from dalle2_video_tpu.train.checkpoint import RollingCheckpointManager

    mgr = RollingCheckpointManager(
        str(tmp_path / "ckpts"), max_to_keep=1, best_k=2, metric_key="val_loss"
    )
    # step 1: loss 1.0 (overall best); step 2: loss 9.0 (kth best initially);
    # step 3: loss 2.0 — better than 9.0 but worse than 1.0: must displace 2
    for step, v in {1: 1.0, 2: 9.0, 3: 2.0, 4: 7.0}.items():
        mgr.save(step, {"w": jnp.full(2, float(step))},
                 metrics={"val_loss": v})
        mgr.wait()
    kept_best = sorted(mgr._best_mgr.all_steps())
    assert kept_best == [1, 3], kept_best
    best = mgr.restore_best({"w": jnp.zeros(2)})
    assert float(best["w"][0]) == 1.0
    mgr.close()


def test_rolling_checkpoint_keep_period(tmp_path):
    """keep_period retains every Nth step permanently alongside the
    newest-K window (archival retention class for production runs)."""
    import jax.numpy as jnp

    from dalle2_video_tpu.train.checkpoint import RollingCheckpointManager

    mgr = RollingCheckpointManager(
        str(tmp_path / "ckpts"), max_to_keep=2, best_k=0, keep_period=4,
    )
    for step in range(1, 11):
        mgr.save(step, {"w": jnp.full(2, float(step))})
        mgr.wait()
    kept = set(mgr.all_steps())
    assert {4, 8} <= kept, kept       # archival multiples survive
    assert {9, 10} <= kept, kept      # newest window intact
    assert 5 not in kept and 6 not in kept, kept
    mgr.close()


def test_elastic_supervisor_restarts(tmp_path):
    """run_elastic.py restarts a crashing child and appends resume=true."""
    import subprocess
    import sys
    import textwrap

    marker = tmp_path / "attempts.txt"
    child = tmp_path / "flaky.py"
    child.write_text(textwrap.dedent(f"""
        import pathlib, sys
        m = pathlib.Path({str(marker)!r})
        n = int(m.read_text()) if m.exists() else 0
        m.write_text(str(n + 1))
        # fail the first two attempts; succeed only if resumed
        if n < 2:
            sys.exit(3)
        assert "resume=true" in sys.argv, sys.argv
        sys.exit(0)
    """))
    r = subprocess.run(
        [sys.executable, "scripts/run_elastic.py", "--backoff", "0.1",
         "--max-restarts", "5", "--", sys.executable, str(child)],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert marker.read_text() == "3"


def test_checkpoint_layout_helpers(tmp_path):
    """has_checkpoint/load_latest/load_best detect both the
    RollingCheckpointManager layout and the legacy last/best pair."""
    import jax.numpy as jnp

    from dalle2_video_tpu.train.checkpoint import (
        RollingCheckpointManager,
        has_checkpoint,
        load_best,
        load_latest,
        save_checkpoint,
    )

    target = {"w": jnp.zeros(3)}

    # nonexistent dir
    assert not has_checkpoint(str(tmp_path / "nope"))

    # empty manager dir (constructor eagerly creates recent/ + version file)
    mgr = RollingCheckpointManager(str(tmp_path / "mgr"))
    assert not has_checkpoint(str(tmp_path / "mgr"))
    mgr.save(1, {"w": jnp.ones(3)}, metrics={"val_loss": 2.0})
    mgr.save(2, {"w": jnp.full(3, 5.0)}, metrics={"val_loss": 9.0})
    mgr.close()
    assert has_checkpoint(str(tmp_path / "mgr"))
    assert float(load_latest(str(tmp_path / "mgr"), target)["w"][0]) == 5.0
    assert float(load_best(str(tmp_path / "mgr"), target)["w"][0]) == 1.0

    # legacy last/best pair
    leg = tmp_path / "legacy"
    save_checkpoint(str(leg / "last"), {"w": jnp.full(3, 7.0)})
    save_checkpoint(str(leg / "best"), {"w": jnp.full(3, 3.0)})
    assert has_checkpoint(str(leg))
    assert float(load_latest(str(leg), target)["w"][0]) == 7.0
    assert float(load_best(str(leg), target)["w"][0]) == 3.0


def test_checkpoint_version_stamp_preserved_by_readers():
    """Read-only helpers (has_checkpoint/load_latest) construct managers
    too; they must not clobber the recorded WRITER version."""
    import tempfile

    from dalle2_video_tpu.train import checkpoint as ckpt_mod
    from dalle2_video_tpu.train.checkpoint import RollingCheckpointManager

    with tempfile.TemporaryDirectory() as d:
        m = RollingCheckpointManager(d, max_to_keep=1)
        vfile = m.directory / ckpt_mod._VERSION_KEY
        assert vfile.read_text().strip() == ckpt_mod.__version__
        vfile.write_text("0.0-old-writer")  # simulate an old writer
        RollingCheckpointManager(d, max_to_keep=1)  # a reader constructs one
        assert vfile.read_text().strip() == "0.0-old-writer"


def test_make_sharded_sample_stage_matches_single_device(mesh8):
    """Stage sampler jitted with batch-data sharding returns the
    single-device samples (per-row keys make rows key-pure)."""
    import jax.numpy as jnp

    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.parallel.sharded import make_sharded_sample_stage
    from dalle2_video_tpu.utils import keys as keyutil

    u = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=16,
        init_cross_embed=False, init_conv_ksize=3,
    )
    dec = VideoDecoder(VideoDecoderConfig(
        unets=(u,), frame_sizes=(8,), frame_numbers=(2,),
        timesteps=6, sample_timesteps=(3,),
    ))
    params = dec.init_params(jax.random.PRNGKey(0))
    emb = jax.random.normal(jax.random.PRNGKey(1), (8, 16))
    ks = keyutil.batch_keys(list(range(8)))

    ref = np.asarray(dec.sample_stage(
        0, params, ks, batch_size=8, video_embed=emb))
    fn = make_sharded_sample_stage(dec, mesh8, 0)
    got = np.asarray(fn(params, ks, emb, jnp.zeros((8, 2, 4, 4, 3))))
    np.testing.assert_allclose(got, ref, atol=1e-5)
