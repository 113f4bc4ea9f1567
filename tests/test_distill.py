"""Progressive/guided distillation (train/distill.py).

Covers: the one-step-target closure property (algebra exactness against
the real sampler update), grid refinement, learning (loss drops on a
tiny decoder), the guided-teacher trace, and the drop-in contract
(distilled params sample through the existing DDIM loop)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.engine.decoder import (
    VideoDecoder,
    VideoDecoderConfig,
    ddim_time_pairs,
)
from dalle2_video_tpu.models import UNet3DConfig
from dalle2_video_tpu.train.distill import DistillConfig, DistillTrainer

B, T, EMB = 2, 2, 16


def tiny_decoder(**cfg_kw):
    unet = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=EMB,
        init_cross_embed=False, init_conv_ksize=3,
    )
    cfg = VideoDecoderConfig(
        unets=(unet,), frame_sizes=(8,), frame_numbers=(T,), timesteps=20,
        **cfg_kw,
    )
    dec = VideoDecoder(cfg)
    return dec, dec.init_params(jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def setup():
    dec, params = tiny_decoder()
    tr = DistillTrainer(dec, DistillConfig(student_steps=4, lr=1e-3))
    return dec, params, tr


def test_grid_refinement(setup):
    _, _, tr = setup
    starts = np.asarray(tr.t_starts)
    ends = np.asarray(tr.t_ends)
    mids = np.asarray(tr.t_mids)
    coarse = ddim_time_pairs(20, 4)
    assert list(zip(starts.tolist(), ends.tolist())) == coarse
    assert np.all(starts > mids) and np.all(mids > ends)
    assert ends[-1] == -1  # terminal alpha_bar = 1 step preserved


def test_one_step_target_closure(setup):
    """x~ is EXACTLY the x-prediction that makes one student DDIM step
    from z_t land on the teacher's two-step endpoint — checked through
    the trainer's own _ddim_to (same algebra as p_sample_loop_ddim)."""
    _, _, tr = setup
    rng = np.random.default_rng(0)
    nd = 5
    shape = (3, 2, 4, 4, 3)
    z_t = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    x0_a = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    x0_b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    for k in range(tr.t_starts.shape[0]):
        t = jnp.full((3,), tr.t_starts[k], jnp.int32)
        t_mid = jnp.full((3,), tr.t_mids[k], jnp.int32)
        t_end = jnp.full((3,), tr.t_ends[k], jnp.int32)
        z_mid = tr._ddim_to(z_t, x0_a, t, t_mid, nd)
        z_end = tr._ddim_to(z_mid, x0_b, t_mid, t_end, nd)

        a_t, s_t = tr._alpha_sigma(t, nd)
        a_e, s_e = tr._alpha_sigma(t_end, nd)
        ratio = s_e / jnp.maximum(s_t, 1e-20)
        target = (z_end - ratio * z_t) / (a_e - ratio * a_t)

        z_check = tr._ddim_to(z_t, target, t, t_end, nd)
        np.testing.assert_allclose(
            np.asarray(z_check), np.asarray(z_end), rtol=1e-4, atol=1e-4
        )


def test_ddim_to_matches_sampler_update(setup):
    """_ddim_to reproduces the eta=0 branch of p_sample_loop_ddim's
    update: x_next = x0*sqrt(a_next) + sqrt(1-a_next)*pred_noise."""
    dec, _, tr = setup
    sched = dec.schedules[0]
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((2, 3)), jnp.float32)
    t_now, t_next = 15, 9
    t = jnp.full((2,), t_now, jnp.int32)
    acp_pad = np.concatenate([[1.0], np.asarray(sched.alphas_cumprod)])
    alpha, alpha_next = acp_pad[t_now + 1], acp_pad[t_next + 1]
    pred_noise = sched.predict_noise_from_start(z, t, x0)
    want = x0 * np.sqrt(alpha_next) + np.sqrt(1 - alpha_next) * np.asarray(
        pred_noise
    )
    got = tr._ddim_to(
        z, x0, t, jnp.full((2,), t_next, jnp.int32), 2
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_teacher_init_starts_near_zero_loss(setup):
    """Student == teacher at cond_scale 1 has ~zero distill loss: DDIM
    steps with a slowly-varying x-prediction compose, so the teacher's
    own one-step prediction already matches its two-step endpoint."""
    dec, params, tr = setup
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 8, 8, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))
    loss = jax.jit(tr.loss)(
        params["unet_0"], params, jax.random.PRNGKey(3), video,
        video_embed=emb,
    )
    assert float(loss) < 1e-4, float(loss)


def test_distillation_learns(setup):
    dec, params, tr = setup
    # student starts from a DIFFERENT random init (a teacher-initialized
    # student starts at ~0 loss — see the test above — leaving nothing
    # to learn), then regresses onto the teacher's two-step targets
    far = dec.init_params(jax.random.PRNGKey(42))["unet_0"]
    state = tr.init_state(params, student_params=far)
    step = jax.jit(tr.distill_step)
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 8, 8, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))
    losses = []
    k = jax.random.PRNGKey(3)  # FIXED key: same segments + noise every
    for it in range(30):  # step -> pure optimization, fast convergence
        state, loss = step(state, params, k, video, video_embed=emb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert int(state.step) == 30
    assert np.mean(losses[-5:]) < 0.5 * np.mean(losses[:5]), losses


def test_guided_teacher_traces():
    dec, params = tiny_decoder(video_cond_drop_prob=0.1, text_cond_drop_prob=0.1)
    tr = DistillTrainer(
        dec, DistillConfig(student_steps=4, teacher_cond_scale=2.0)
    )
    state = tr.init_state(params)
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 8, 8, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))
    state, loss = jax.jit(tr.distill_step)(
        state, params, jax.random.PRNGKey(3), video, video_embed=emb
    )
    assert np.isfinite(float(loss))


def test_sr_stage_distillation():
    """Lowres-conditioned SR stages distill too (r4: the former scope
    guard is gone). The loss builds SAMPLING-consistent conditioning —
    fixed lowres_noise_sample_level, prev-stage-geometry simulated lowres
    — so teacher-init still starts at ~zero loss (the composition
    property is conditioning-agnostic) and a step runs finite."""
    unet = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=EMB,
        init_cross_embed=False, init_conv_ksize=3,
    )
    cfg = VideoDecoderConfig(
        unets=(unet, unet), frame_sizes=(8, 16), frame_numbers=(T, T),
        timesteps=20, use_noise_for_lowres_cond=True,
    )
    dec = VideoDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    tr = DistillTrainer(dec, DistillConfig(student_steps=4, unet_number=2))

    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 16, 16, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))

    # conditioning matches the sample() path: fixed level, stage-i shapes
    lk = tr._lowres_cond_kwargs(jax.random.PRNGKey(5), video, params)
    assert lk["lowres_cond_video"].shape == (B, T, 16, 16, 3)
    np.testing.assert_array_equal(
        np.asarray(lk["lowres_noise_level"]),
        int(dec.config.lowres_noise_sample_level * 1000),
    )

    loss = jax.jit(tr.loss)(
        params["unet_1"], params, jax.random.PRNGKey(3), video,
        video_embed=emb,
    )
    assert float(loss) < 1e-4, float(loss)

    state = tr.init_state(params)
    state, step_loss = jax.jit(tr.distill_step)(
        state, params, jax.random.PRNGKey(4), video, video_embed=emb
    )
    assert np.isfinite(float(step_loss))
    # the student swaps into the SR slot of the full param dict
    sp = tr.student_decoder_params(state, params)
    assert set(sp) == set(params)


def test_guided_teacher_requires_cond_drop():
    # explicit zero conditional dropout (the reference DEFAULT is 0.1/0.5,
    # so the module-level fixture can in fact be guided)
    dec, _ = tiny_decoder(video_cond_drop_prob=0.0, text_cond_drop_prob=0.0)
    with pytest.raises(ValueError, match="conditional dropout"):
        DistillTrainer(dec, DistillConfig(teacher_cond_scale=3.0))


def test_student_drops_into_ddim_sampler(setup):
    dec, params, tr = setup
    state = tr.init_state(params)
    sp = tr.student_decoder_params(state, params)
    assert set(sp.keys()) == set(params.keys())
    out = dec.p_sample_loop_ddim(
        0, sp["unet_0"], jax.random.PRNGKey(0), (1, T, 8, 8, 3),
        timesteps=tr.cfg.student_steps, cond_scale=1.0,
        video_embed=jnp.zeros((1, EMB)),
    )
    assert out.shape == (1, T, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_degenerate_grid_rejected():
    dec, _ = tiny_decoder()
    with pytest.raises(ValueError, match="degenerate|collapse"):
        DistillTrainer(dec, DistillConfig(student_steps=20))


def test_distill_step_sharded_matches_single(setup, mesh8):
    """DP distillation on the virtual 8-device mesh (batch over `data`,
    state/teacher replicated): same loss and same student update as the
    single-device step — GSPMD inserts the cross-shard mean, nothing in
    the trainer is mesh-aware."""
    from dalle2_video_tpu.parallel.mesh import shard_batch
    from dalle2_video_tpu.parallel.sharded import replicated_tree

    dec, params, tr = setup
    b = 4  # data axis of the 4x2 mesh
    video = jax.random.uniform(jax.random.PRNGKey(1), (b, T, 8, 8, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (b, EMB))

    state = tr.init_state(params, student_params=dec.init_params(
        jax.random.PRNGKey(7))["unet_0"])
    key = jax.random.PRNGKey(3)

    st_ref, loss_ref = jax.jit(tr.distill_step)(
        state, params, key, video, video_embed=emb
    )

    # replicated_tree returns a SHARDING tree — device_put places the data
    st_sh = jax.device_put(state, replicated_tree(state, mesh8))
    teacher_sh = jax.device_put(params, replicated_tree(params, mesh8))
    vid_s, emb_s = shard_batch(mesh8, (video, emb))
    st2, loss = jax.jit(tr.distill_step)(
        st_sh, teacher_sh, key, vid_s, video_embed=emb_s
    )

    np.testing.assert_allclose(float(loss), float(loss_ref), rtol=2e-4)
    for x, y in zip(
        jax.tree_util.tree_leaves(st2.student),
        jax.tree_util.tree_leaves(st_ref.student),
    ):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-4)


def test_student_checkpoint_roundtrip_serve_deploy(tmp_path):
    """The serve-time deployment contract (scripts/serve.py serve_distill):
    a saved DistillState restores into a FRESH trainer's template, the
    student swaps into exactly its cascade slot, and only that stage's
    DDIM grid is pinned."""
    from dalle2_video_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )

    unet = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=EMB,
        init_cross_embed=False, init_conv_ksize=3,
    )
    cfg = VideoDecoderConfig(
        unets=(unet, unet), frame_sizes=(8, 16), frame_numbers=(T, T),
        timesteps=20, sample_timesteps=(10, 10),
    )
    dec = VideoDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))

    # "distill-time": perturb the student so the swap is observable
    tr = DistillTrainer(dec, DistillConfig(student_steps=4, unet_number=1))
    dstate = tr.init_state(params)
    dstate.ema = jax.tree_util.tree_map(lambda x: x + 1.0, dstate.ema)
    save_checkpoint(str(tmp_path / "state"), dstate)

    # "serve-time": fresh process -> fresh template -> restore -> swap
    tr2 = DistillTrainer(dec, DistillConfig(student_steps=4, unet_number=1))
    fresh = tr2.init_state(params)
    fresh = load_checkpoint(str(tmp_path / "state"), fresh)
    served = tr2.student_decoder_params(fresh, params, use_ema=True)

    diff0 = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        served["unet_0"], params["unet_0"])
    assert min(jax.tree_util.tree_leaves(diff0)) == 1.0  # swapped (+1 everywhere)
    same1 = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.all(a == b)), served["unet_1"], params["unet_1"])
    assert all(jax.tree_util.tree_leaves(same1))  # SR stage untouched

    # slot pinning as serve.py applies it
    steps, unet_no = 4, 1
    pinned = tuple(
        steps if i == unet_no - 1 else s
        for i, s in enumerate(dec.sample_timesteps)
    )
    assert pinned == (4, 10)
