"""UNet3D shape/conditioning tests (SURVEY.md §4, item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.models import UNet3D, UNet3DConfig

B, T, H, W, C = 2, 4, 16, 16, 3


def tiny_cfg(**kw):
    base = dict(
        dim=16,
        dim_mults=(1, 2),
        channels=C,
        attn_heads=2,
        attn_dim_head=8,
        num_resnet_blocks=1,
        resnet_groups=4,
        video_embed_dim=32,
        cond_on_video_embeds=True,
        init_cross_embed_kernel_sizes=(3, 7),
    )
    base.update(kw)
    return UNet3DConfig(**base)


def init_and_run(cfg, **inputs):
    model = UNet3D(cfg)
    x = jnp.zeros((B, T, H, W, cfg.channels))
    time = jnp.array([0, 500], dtype=jnp.int32)
    kwargs = dict(inputs)
    if cfg.cond_on_video_embeds and "video_embed" not in kwargs:
        kwargs["video_embed"] = jnp.ones((B, cfg.video_embed_dim))
    params = model.init(jax.random.PRNGKey(0), x, time, **kwargs)
    out = model.apply(params, x, time, **kwargs)
    return params, out


def test_output_shape_base():
    cfg = tiny_cfg()
    _, out = init_and_run(cfg)
    assert out.shape == (B, T, H, W, C)


def test_zero_init_output_conv():
    """to_out is zero-init, so output at init must be exactly zero."""
    cfg = tiny_cfg()
    _, out = init_and_run(cfg)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


def test_learned_variance_channels_out():
    cfg = tiny_cfg(channels_out=2 * C)
    _, out = init_and_run(cfg)
    assert out.shape == (B, T, H, W, 2 * C)


def test_lowres_cond_shapes():
    cfg = tiny_cfg(lowres_cond=True, lowres_noise_cond=True)
    _, out = init_and_run(
        cfg,
        lowres_cond_video=jnp.zeros((B, T, H, W, C)),
        lowres_noise_level=jnp.array([100, 200], jnp.int32),
    )
    assert out.shape == (B, T, H, W, C)


def test_self_cond():
    cfg = tiny_cfg(self_cond=True)
    _, out = init_and_run(cfg, self_cond=jnp.zeros((B, T, H, W, C)))
    assert out.shape == (B, T, H, W, C)


def test_text_conditioning():
    cfg = tiny_cfg(cond_on_text_encodings=True, text_embed_dim=24, max_text_len=10)
    _, out = init_and_run(cfg, text_encodings=jnp.ones((B, 7, 24)))
    assert out.shape == (B, T, H, W, C)


def _derandomize_out_conv(params):
    """to_out is zero-init (so output at init is 0 regardless of inputs);
    replace it so conditioning differences reach the output."""
    import flax

    p = flax.core.unfreeze(params) if hasattr(params, "unfreeze") else dict(params)
    kern = p["params"]["to_out"]["Conv_0"]["kernel"]
    p["params"]["to_out"]["Conv_0"]["kernel"] = jnp.ones_like(kern) * 0.1
    return p


def test_cfg_null_masks_change_output():
    """Dropping conditioning must route through null embeds: different output."""
    cfg = tiny_cfg()
    model = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, C))
    time = jnp.array([10, 10], jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.video_embed_dim))
    params = _derandomize_out_conv(
        model.init(jax.random.PRNGKey(0), x, time, video_embed=emb)
    )
    kept = model.apply(params, x, time, video_embed=emb,
                       video_keep_mask=jnp.array([True, True]))
    dropped = model.apply(params, x, time, video_embed=emb,
                          video_keep_mask=jnp.array([False, False]))
    assert float(jnp.abs(kept - dropped).max()) > 1e-6


def test_cfg_keep_mask_is_per_sample():
    """Keep mask must act per batch row, not globally."""
    cfg = tiny_cfg()
    model = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, C))
    time = jnp.array([10, 10], jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, cfg.video_embed_dim))
    params = _derandomize_out_conv(
        model.init(jax.random.PRNGKey(0), x, time, video_embed=emb)
    )
    mixed = model.apply(params, x, time, video_embed=emb,
                        video_keep_mask=jnp.array([True, False]))
    kept = model.apply(params, x, time, video_embed=emb,
                       video_keep_mask=jnp.array([True, True]))
    dropped = model.apply(params, x, time, video_embed=emb,
                          video_keep_mask=jnp.array([False, False]))
    np.testing.assert_allclose(np.asarray(mixed[0]), np.asarray(kept[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(mixed[1]), np.asarray(dropped[1]), atol=1e-5)


def test_memory_efficient_variant():
    cfg = tiny_cfg(memory_efficient=True)
    _, out = init_and_run(cfg)
    assert out.shape == (B, T, H, W, C)


def test_stage_self_attn_and_options():
    cfg = tiny_cfg(
        self_attn=(False, True),
        scale_skip_connection=True,
        combine_upsample_fmaps=True,
        pixel_shuffle_upsample=False,
        cross_embed_downsample=True,
    )
    _, out = init_and_run(cfg)
    assert out.shape == (B, T, H, W, C)


def test_cascade_cast():
    cfg = tiny_cfg()
    sr = cfg.cast_for_cascade(
        lowres_cond=True,
        lowres_noise_cond=True,
        channels=C,
        channels_out=C,
        cond_on_video_embeds=True,
        cond_on_text_encodings=False,
    )
    assert sr.lowres_cond and sr.lowres_noise_cond
    assert cfg.lowres_cond is False  # original untouched


def test_unconditional():
    cfg = tiny_cfg(cond_on_video_embeds=False, video_embed_dim=None)
    _, out = init_and_run(cfg)
    assert out.shape == (B, T, H, W, C)


def test_jit_and_grad():
    cfg = tiny_cfg(num_resnet_blocks=1)
    model = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, C))
    time = jnp.array([10, 20], jnp.int32)
    emb = jnp.ones((B, cfg.video_embed_dim))
    params = _derandomize_out_conv(
        model.init(jax.random.PRNGKey(0), x, time, video_embed=emb)
    )

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, x, time, video_embed=emb)
        return jnp.mean(out**2)

    g = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in flat)
    # gradient reaches the stem (deepest layer through all skips); requires
    # the non-zero out conv installed above
    stem = g["params"]["init_conv"]["conv0"]["Conv_0"]["kernel"]
    assert float(jnp.abs(stem).max()) > 0.0


def test_unet_temporal_conv():
    """UnetTemporalConv: per-frame 2D unet + zero-init temporal mixer; works
    inside VideoDecoder via arch='temporal_conv'."""
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig

    cfg = tiny_cfg(arch="temporal_conv", self_attn=(False, True))
    dec = VideoDecoder(
        VideoDecoderConfig(
            unets=(cfg,), frame_sizes=(16,), frame_numbers=(4,),
            timesteps=10, learned_variance=False,
        )
    )
    params = dec.init_params(jax.random.PRNGKey(0))
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, 4, 16, 16, 3))
    emb = jnp.ones((B, cfg.video_embed_dim))
    loss = dec.loss(params, jax.random.PRNGKey(2), video, video_embed=emb)
    assert np.isfinite(float(loss))


def test_temporal_attention_option():
    """Factorized temporal attention: runs, and makes the output
    frame-order sensitive even without joint attention."""
    cfg = tiny_cfg(temporal_attention=True, attend_at_middle=False)
    model = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, W, C))
    time = jnp.array([10, 10], jnp.int32)
    emb = jnp.ones((B, cfg.video_embed_dim))
    params = _derandomize_out_conv(
        model.init(jax.random.PRNGKey(0), x, time, video_embed=emb)
    )
    out = model.apply(params, x, time, video_embed=emb)
    out_rev = model.apply(params, x[:, ::-1], time, video_embed=emb)
    assert out.shape == (B, T, H, W, C)
    # flipping frames must NOT just flip the output (temporal mixing exists
    # beyond per-frame ops)... attention is permutation-equivariant, so use
    # a non-permutation change: zero out one frame
    x2 = x.at[:, 0].set(0.0)
    out2 = model.apply(params, x2, time, video_embed=emb)
    # a change in frame 0 must propagate to OTHER frames' outputs
    assert float(jnp.abs(out[:, 1:] - out2[:, 1:]).max()) > 1e-6


def test_cross_attention_broadcast_impl_matches_xla():
    """impl='broadcast' (VPU broadcast-reduce, r2 perf) == default einsum."""
    from dalle2_video_tpu.models.layers import CrossAttention

    b, n, m, dim, ctx_dim = 2, 24, 5, 16, 12
    x = jax.random.normal(jax.random.PRNGKey(0), (b, n, dim))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (b, m, ctx_dim))
    mask = jnp.array([[True] * 5, [True, True, True, False, False]])
    a_x = CrossAttention(dim, context_dim=ctx_dim, heads=2, dim_head=8, impl="xla")
    a_b = CrossAttention(dim, context_dim=ctx_dim, heads=2, dim_head=8, impl="broadcast")
    params = a_x.init(jax.random.PRNGKey(2), x, ctx)
    for msk in (None, mask):
        out_x = a_x.apply(params, x, ctx, msk)
        out_b = a_b.apply(params, x, ctx, msk)
        np.testing.assert_allclose(
            np.asarray(out_b), np.asarray(out_x), atol=2e-5
        )


def test_joint_attention_auto_impl():
    """attention_impl="auto" resolves per static token count (xla below 4096
    — the regime where XLA fusion measured faster; flash above, TPU only)
    and matches the explicit xla path bit-for-bit at small token counts."""
    import numpy as np

    from dalle2_video_tpu.models.layers import JointSpaceTimeAttention

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, 16))
    auto = JointSpaceTimeAttention(16, heads=2, dim_head=8, impl="auto")
    xla = JointSpaceTimeAttention(16, heads=2, dim_head=8, impl="xla")
    p = xla.init(jax.random.PRNGKey(1), x)
    np.testing.assert_array_equal(
        np.asarray(auto.apply(p, x)), np.asarray(xla.apply(p, x))
    )


def test_per_frame_embed_tokens_condition_and_carry_order():
    """(b, k, d) video embeds: one conditioning token per frame embed with
    a frame-position signal — both the CONTENT and the ORDER of the
    per-frame embeds change the output (DALLE2Video temporal_emb mode)."""
    cfg = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=16,
        init_cross_embed=False, init_conv_ksize=3,
        cond_on_video_embeds=True,
    )
    unet = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 8, 8, 3))
    t = jnp.zeros((2,), jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16))  # k=3 frames
    params = unet.init(jax.random.PRNGKey(2), x, t, video_embed=emb)
    # perturb: zero-init out conv makes untrained outputs identically zero
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * rng.standard_normal(p.shape).astype(p.dtype),
        params,
    )

    out = unet.apply(params, x, t, video_embed=emb)
    assert np.isfinite(np.asarray(out)).all()

    # content matters
    out2 = unet.apply(params, x, t, video_embed=emb + 1.0)
    assert float(np.abs(np.asarray(out2) - np.asarray(out)).max()) > 1e-6

    # ORDER matters (sinusoidal frame positions break the permutation
    # invariance of cross-attention over the token set)
    out3 = unet.apply(params, x, t, video_embed=emb[:, ::-1])
    assert float(np.abs(np.asarray(out3) - np.asarray(out)).max()) > 1e-6
