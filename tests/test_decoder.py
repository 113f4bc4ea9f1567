"""VideoDecoder engine tests: loss, cascade wiring, DDPM/DDIM sampling
(SURVEY.md §4, items 3+5 — golden fixtures + end-to-end smoke at tiny res)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
from dalle2_video_tpu.models import UNet3DConfig

B, T = 2, 2
EMB = 16


def tiny_unet(**kw):
    base = dict(
        dim=8,
        dim_mults=(1, 2),
        attn_heads=2,
        attn_dim_head=4,
        num_resnet_blocks=1,
        resnet_groups=4,
        video_embed_dim=EMB,
        init_cross_embed=False,
        init_conv_ksize=3,
    )
    base.update(kw)
    return UNet3DConfig(**base)


@pytest.fixture(scope="module")
def cascade():
    cfg = VideoDecoderConfig(
        unets=(tiny_unet(), tiny_unet()),
        frame_sizes=(8, 16),
        frame_numbers=(T, T),
        timesteps=20,
        sample_timesteps=(None, 5),  # stage 2 exercises DDIM
        learned_variance=True,  # first unet learned-var (reference default)
        use_noise_for_lowres_cond=True,
    )
    dec = VideoDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    return dec, params


def test_cascade_resolution(cascade):
    dec, params = cascade
    # first unet: embed-conditioned, no lowres; second: lowres SR, no embed
    assert dec.unet_configs[0].cond_on_video_embeds
    assert not dec.unet_configs[0].lowres_cond
    assert dec.unet_configs[1].lowres_cond
    assert not dec.unet_configs[1].cond_on_video_embeds
    # learned variance only on first unet (reference pad_tuple fillvalue=False)
    assert dec.learned_variance == (True, False)
    assert dec.unet_configs[0].channels_out == 6
    assert dec.unet_configs[1].channels_out == 3
    # default beta schedules: cosine for base, linear for SR (reference :1367)
    assert float(dec.schedules[1].betas[0]) == pytest.approx(
        (1000 / 20) * 1e-4, rel=1e-5
    )
    assert "unet_0" in params and "unet_1" in params


def test_loss_base_unet(cascade):
    dec, params = cascade
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 16, 16, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))
    loss = dec.loss(
        params, jax.random.PRNGKey(3), video, video_embed=emb, unet_number=1
    )
    assert loss.shape == ()
    assert np.isfinite(float(loss))


def test_loss_sr_unet(cascade):
    dec, params = cascade
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 16, 16, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))
    loss = dec.loss(
        params, jax.random.PRNGKey(3), video, video_embed=emb, unet_number=2
    )
    assert np.isfinite(float(loss))


def test_loss_is_jittable_and_differentiable(cascade):
    dec, params = cascade
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 16, 16, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))

    @jax.jit
    def f(p, rng):
        return dec.loss(p, rng, video, video_embed=emb, unet_number=1)

    g = jax.grad(lambda p: f(p, jax.random.PRNGKey(0)))(params)
    leaves = jax.tree_util.tree_leaves(g["unet_0"])
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_loss_changes_with_rng(cascade):
    dec, params = cascade
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 16, 16, 3))
    emb = jnp.zeros((B, EMB))
    l1 = float(dec.loss(params, jax.random.PRNGKey(10), video, video_embed=emb))
    l2 = float(dec.loss(params, jax.random.PRNGKey(11), video, video_embed=emb))
    assert l1 != l2  # different timesteps/noise draws


def test_full_cascade_sample(cascade):
    dec, params = cascade
    emb = jax.random.normal(jax.random.PRNGKey(4), (B, EMB))
    vid = dec.sample(params, jax.random.PRNGKey(5), video_embed=emb, cond_scale=2.0)
    assert vid.shape == (B, T, 16, 16, 3)
    arr = np.asarray(vid)
    assert np.all(np.isfinite(arr))
    # clip_denoised + unnormalize keeps the result near [0, 1]
    assert arr.min() >= -0.6 and arr.max() <= 1.6


def test_stop_at_unet_number(cascade):
    dec, params = cascade
    emb = jax.random.normal(jax.random.PRNGKey(4), (B, EMB))
    vid = dec.sample(
        params, jax.random.PRNGKey(5), video_embed=emb, stop_at_unet_number=1
    )
    assert vid.shape == (B, T, 8, 8, 3)


def test_start_mid_cascade(cascade):
    dec, params = cascade
    emb = jax.random.normal(jax.random.PRNGKey(4), (B, EMB))
    base = jax.random.uniform(jax.random.PRNGKey(6), (B, T, 8, 8, 3))
    vid = dec.sample(
        params,
        jax.random.PRNGKey(5),
        video_embed=emb,
        start_at_unet_number=2,
        video=base,
    )
    assert vid.shape == (B, T, 16, 16, 3)


def test_unconditional_decoder():
    cfg = VideoDecoderConfig(
        unets=(tiny_unet(video_embed_dim=None),),
        frame_sizes=(8,),
        frame_numbers=(T,),
        timesteps=10,
        learned_variance=False,
        unconditional=True,
    )
    dec = VideoDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 8, 8, 3))
    loss = dec.loss(params, jax.random.PRNGKey(2), video)
    assert np.isfinite(float(loss))
    vid = dec.sample(params, jax.random.PRNGKey(3), batch_size=B)
    assert vid.shape == (B, T, 8, 8, 3)


def test_predict_v_and_x0_losses():
    for px, pv in [(True, False), (False, True)]:
        cfg = VideoDecoderConfig(
            unets=(tiny_unet(),),
            frame_sizes=(8,),
            frame_numbers=(T,),
            timesteps=10,
            learned_variance=False,
            predict_x_start=px,
            predict_v=pv,
        )
        dec = VideoDecoder(cfg)
        params = dec.init_params(jax.random.PRNGKey(0))
        video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 8, 8, 3))
        emb = jnp.zeros((B, EMB))
        loss = dec.loss(params, jax.random.PRNGKey(2), video, video_embed=emb)
        assert np.isfinite(float(loss))


def test_dynamic_threshold():
    cfg = VideoDecoderConfig(
        unets=(tiny_unet(),),
        frame_sizes=(8,),
        frame_numbers=(T,),
        timesteps=10,
        learned_variance=False,
        use_dynamic_thres=True,
        dynamic_thres_percentile=0.9,
    )
    dec = VideoDecoder(cfg)
    x = jnp.concatenate([jnp.ones((1, 100)) * 0.1, jnp.ones((1, 20)) * 5.0], axis=1)
    x = x.reshape(1, 1, 1, 120, 1)
    y = dec.dynamic_threshold(x)
    assert float(jnp.abs(y).max()) <= 1.0
    # static variant clips to [-1, 1]
    dec2 = VideoDecoder(
        VideoDecoderConfig(
            unets=(tiny_unet(),), frame_sizes=(8,), frame_numbers=(T,),
            timesteps=10, learned_variance=False,
        )
    )
    y2 = dec2.dynamic_threshold(x)
    np.testing.assert_allclose(np.asarray(y2).max(), 1.0)


def test_text_conditioning_loss_and_assert():
    cfg = VideoDecoderConfig(
        unets=(tiny_unet(cond_on_text_encodings=True, text_embed_dim=12, max_text_len=6),),
        frame_sizes=(8,),
        frame_numbers=(T,),
        timesteps=10,
        learned_variance=False,
    )
    dec = VideoDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, 8, 8, 3))
    emb = jnp.zeros((B, EMB))
    text = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 12))
    # quirk #3 fixed: text-conditioned TRAINING must work
    loss = dec.loss(
        params, jax.random.PRNGKey(3), video, video_embed=emb, text_encodings=text
    )
    assert np.isfinite(float(loss))
    # and omitting required text must raise
    with pytest.raises(AssertionError):
        dec.loss(params, jax.random.PRNGKey(3), video, video_embed=emb)


def test_chunked_sampling(cascade):
    """max_batch_size chunks the sample batch (reference
    decoder_sample_in_chunks wiring, trainer.py:278,308)."""
    dec, params = cascade
    emb = jax.random.normal(jax.random.PRNGKey(0), (3, EMB))
    out = dec.sample(
        params, jax.random.PRNGKey(1), video_embed=emb,
        stop_at_unet_number=1, max_batch_size=2,
    )
    assert out.shape[0] == 3
    assert np.all(np.isfinite(np.asarray(out)))


def test_bf16_sampling_close_to_f32():
    """sample_compute_dtype="bfloat16" runs the denoiser in bf16 (diffusion
    math stays f32): same shapes/dtype out, numerically close to the f32
    sampler. Params are perturbed because the zero-init output conv makes an
    untrained unet output exactly 0 in ANY dtype (vacuous comparison)."""
    base = dict(
        unets=(tiny_unet(),),
        frame_sizes=(8,),
        frame_numbers=(T,),
        timesteps=4,
        learned_variance=False,
    )
    dec_f = VideoDecoder(VideoDecoderConfig(**base))
    dec_b = VideoDecoder(
        VideoDecoderConfig(**base, sample_compute_dtype="bfloat16")
    )
    params = dec_f.init_params(jax.random.PRNGKey(0))
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(9), len(leaves))
    params = jax.tree_util.tree_unflatten(
        treedef,
        [l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB)) * 0.1

    # single denoiser call: bf16 path must actually differ (it computes in
    # bf16) but stay close, and return f32
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 8, 8, 3))
    t = jnp.zeros((B,), jnp.int32)
    of = dec_f._unet_apply(0, params["unet_0"], x, t, video_embed=emb)
    ob = dec_b._unet_apply(0, params["unet_0"], x, t, video_embed=emb)
    assert ob.dtype == jnp.float32
    d_call = float(jnp.abs(of - ob).max())
    assert 0.0 < d_call < 0.1, d_call

    # full loop stays finite and close
    vf = dec_f.sample(params, jax.random.PRNGKey(1), batch_size=B, video_embed=emb)
    vb = dec_b.sample(params, jax.random.PRNGKey(1), batch_size=B, video_embed=emb)
    assert np.isfinite(np.asarray(vb)).all()
    np.testing.assert_allclose(np.asarray(vb), np.asarray(vf), atol=0.1)

    # CFG branch (2x-batched forward) honors the cast too
    ocfg = dec_b._unet_apply(0, params["unet_0"], x, t, video_embed=emb,
                             cond_scale=3.0)
    assert ocfg.dtype == jnp.float32
    assert np.isfinite(np.asarray(ocfg)).all()


def test_per_row_keys_batch_composition_invariance(cascade):
    """Per-row PRNG keys (utils/keys.py): each sample's output is a pure
    function of its own key — invariant to batch composition AND to
    max_batch_size chunking. This is what makes served generation
    reproducible per request (scripts/serve.py)."""
    from dalle2_video_tpu.utils import keys as keyutil

    dec, params = cascade
    emb = jax.random.normal(jax.random.PRNGKey(2), (3, EMB))
    rows = keyutil.batch_keys([11, 22, 33])

    full = dec.sample(params, rows, video_embed=emb)
    assert np.isfinite(np.asarray(full)).all()

    # row 1 sampled alone (batch 1) reproduces its row of the batch-3 run
    solo = dec.sample(params, keyutil.take(rows, 1, 1), video_embed=emb[1:2])
    np.testing.assert_allclose(
        np.asarray(solo[0]), np.asarray(full[1]), atol=1e-4
    )

    # chunked sampling keeps each row's key -> identical output
    chunked = dec.sample(params, rows, video_embed=emb, max_batch_size=2)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(full), atol=1e-4
    )

    # different key, different sample (the draws actually vary per row)
    other = dec.sample(
        params, keyutil.batch_keys([99, 22, 33]), video_embed=emb
    )
    assert float(np.abs(np.asarray(other[0]) - np.asarray(full[0])).max()) > 1e-3
    np.testing.assert_allclose(
        np.asarray(other[1]), np.asarray(full[1]), atol=1e-4
    )


def test_cfg_rescale():
    """cfg_rescale (Lin et al. 2023): phi=1 pins the guided prediction's
    per-sample std to the conditional branch's; phi=0 is plain CFG; the
    learned-variance channels are untouched."""
    import dataclasses

    u = tiny_unet()
    base_cfg = VideoDecoderConfig(
        unets=(u,), frame_sizes=(8,), frame_numbers=(T,),
        timesteps=10, learned_variance=True,
    )
    dec0 = VideoDecoder(base_cfg)
    params = dec0.init_params(jax.random.PRNGKey(0))
    # perturb all params: the zero-init output conv makes an untrained
    # net's prediction identically zero (degenerate stds)
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * rng.standard_normal(p.shape).astype(p.dtype),
        params,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 8, 8, 3))
    t = jnp.zeros((B,), jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))

    plain = dec0._unet_apply(0, params["unet_0"], x, t, cond_scale=5.0,
                             video_embed=emb)
    dec1 = VideoDecoder(dataclasses.replace(base_cfg, cfg_rescale=1.0))
    resc = dec1._unet_apply(0, params["unet_0"], x, t, cond_scale=5.0,
                            video_embed=emb)
    cond = dec0._unet_apply(0, params["unet_0"], x, t, cond_scale=1.0,
                            video_embed=emb)

    c = 3  # prediction channels; the rest is learned variance
    axes = (1, 2, 3, 4)
    std_resc = np.asarray(jnp.std(resc[..., :c], axis=axes))
    std_cond = np.asarray(jnp.std(cond[..., :c], axis=axes))
    std_plain = np.asarray(jnp.std(plain[..., :c], axis=axes))
    np.testing.assert_allclose(std_resc, std_cond, rtol=1e-4)
    # exact algebra: rescaled = plain * (std_cond / std_plain) at phi=1
    expect = np.asarray(plain[..., :c]) * (
        std_cond / std_plain
    ).reshape(-1, 1, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(resc[..., :c]), expect, rtol=1e-4)
    # variance channels identical to the plain guided combine
    np.testing.assert_allclose(
        np.asarray(resc[..., c:]), np.asarray(plain[..., c:]), atol=1e-6
    )
    # phi=0 config path equals plain CFG exactly
    dec2 = VideoDecoder(dataclasses.replace(base_cfg, cfg_rescale=0.0))
    same = dec2._unet_apply(0, params["unet_0"], x, t, cond_scale=5.0,
                            video_embed=emb)
    np.testing.assert_allclose(np.asarray(same), np.asarray(plain), atol=1e-6)
