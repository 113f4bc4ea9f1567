"""Negative-prompt guidance: the CFG baseline becomes a NEGATIVE
conditioning instead of the learned null embedding (beyond-reference —
the reference's forward_with_cond_scale only knows the null baseline,
/root/reference/dalle2_video/dalle2_video.py:683-692).

Main invariant: with cfg_rescale=0 the guided output with a negative
embed must EXACTLY equal the two-pass algebra
    out_neg + (out_cond - out_neg) * cond_scale
where both passes are plain conditional forwards (cond_scale=1).
"""

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


def make_decoder(**cfg_kw):
    cfg = VideoDecoderConfig(
        unets=(tiny_unet(),),
        frame_sizes=(8,),
        frame_numbers=(T,),
        timesteps=10,
        sample_timesteps=(4,),
        learned_variance=False,
        **cfg_kw,
    )
    dec = VideoDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * rng.standard_normal(p.shape).astype(p.dtype),
        params,
    )
    return dec, params


def test_negative_guidance_matches_two_pass_algebra():
    dec, params = make_decoder(cfg_rescale=0.0)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, 8, 8, 3))
    t = jnp.full((B,), 5, jnp.int32)
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))
    neg = jax.random.normal(jax.random.PRNGKey(3), (B, EMB))
    scale = 3.0

    guided = dec._unet_apply(
        0, params["unet_0"], x, t, cond_scale=scale,
        video_embed=emb, negative_video_embed=neg,
    )
    out_cond = dec._unet_apply(
        0, params["unet_0"], x, t, cond_scale=1.0, video_embed=emb,
    )
    out_neg = dec._unet_apply(
        0, params["unet_0"], x, t, cond_scale=1.0, video_embed=neg,
    )
    np.testing.assert_allclose(
        np.asarray(guided),
        np.asarray(out_neg + (out_cond - out_neg) * scale),
        atol=1e-5,
    )
    # and it differs from null-baseline CFG at the same scale
    null_cfg = dec._unet_apply(
        0, params["unet_0"], x, t, cond_scale=scale, video_embed=emb,
    )
    assert float(jnp.abs(guided - null_cfg).max()) > 1e-4


def test_negative_ignored_at_cond_scale_one():
    dec, params = make_decoder()
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))
    neg = jax.random.normal(jax.random.PRNGKey(3), (1, EMB))
    a = dec.sample(params, jax.random.PRNGKey(5), video_embed=emb,
                   cond_scale=1.0)
    b = dec.sample(params, jax.random.PRNGKey(5), video_embed=emb,
                   cond_scale=1.0, negative_video_embed=neg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_negative_sampling_changes_output_and_chunks_consistently():
    """A shared (1, d) negative embed changes the sample (vs null CFG) and
    is chunk-invariant under per-row keys + max_batch_size."""
    from dalle2_video_tpu.utils import keys as keyutil

    dec, params = make_decoder()
    n = 3
    emb = jax.random.normal(jax.random.PRNGKey(2), (n, EMB))
    neg = jax.random.normal(jax.random.PRNGKey(3), (1, EMB))
    rows = keyutil.batch_keys([4, 5, 6])

    base = dec.sample(params, rows, video_embed=emb, cond_scale=2.0)
    with_neg = dec.sample(params, rows, video_embed=emb, cond_scale=2.0,
                          negative_video_embed=neg)
    assert float(jnp.abs(base - with_neg).max()) > 1e-5

    chunked = dec.sample(params, rows, video_embed=emb, cond_scale=2.0,
                         negative_video_embed=neg, max_batch_size=2)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(with_neg), atol=1e-4
    )


def test_jit_stages_matches_eager_cascade():
    """sample(jit_stages=True) — one cached compiled program per cascade
    stage (the serving path; the axon compile service rejects a single
    whole-cascade program) — returns exactly the eager-loop samples,
    including with inpainting + negative guidance, and reuses the cache."""
    dec, params = make_decoder()
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, EMB))
    neg = jax.random.normal(jax.random.PRNGKey(3), (1, EMB))
    known = jax.random.uniform(jax.random.PRNGKey(7), (B, T, 8, 8, 3))
    mask = np.zeros((B, T, 1, 1, 1), np.float32)
    mask[:, 0] = 1.0
    kw = dict(video_embed=emb, cond_scale=2.0, negative_video_embed=neg,
              inpaint_video=known, inpaint_mask=jnp.asarray(mask))

    eager = dec.sample(params, jax.random.PRNGKey(5), **kw)
    jitted = dec.sample(params, jax.random.PRNGKey(5), jit_stages=True, **kw)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                               atol=1e-5)
    n_cached = len(dec._stage_jit_cache)
    assert n_cached >= 1
    again = dec.sample(params, jax.random.PRNGKey(5), jit_stages=True, **kw)
    np.testing.assert_allclose(np.asarray(again), np.asarray(jitted), atol=0)
    assert len(dec._stage_jit_cache) == n_cached  # no retrace churn


def test_generate_jit_parts_matches_eager():
    """DALLE2Video.generate(jit_parts=True): split prior/stage programs
    reproduce the unjitted path exactly (with a negative prompt in play)."""
    from dalle2_video_tpu.engine.dalle2video import DALLE2Video
    from dalle2_video_tpu.models.prior import (
        DiffusionPrior, DiffusionPriorConfig, PriorNetworkConfig,
    )

    p = DiffusionPrior(
        DiffusionPriorConfig(
            network=PriorNetworkConfig(dim=EMB, depth=1, heads=2, dim_head=8),
            timesteps=10,
            sample_timesteps=3,
        )
    )
    prior_params = p.init_params(jax.random.PRNGKey(0))
    dec, dec_params = make_decoder()
    wrapper = DALLE2Video(p, dec)
    te = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    nte = jax.random.normal(jax.random.PRNGKey(9), (1, EMB))

    eager = wrapper.generate(
        prior_params, dec_params, jax.random.PRNGKey(2), te, cond_scale=2.0,
        negative_text_embed=nte,
    )
    split = wrapper.generate(
        prior_params, dec_params, jax.random.PRNGKey(2), te, cond_scale=2.0,
        negative_text_embed=nte, jit_parts=True,
    )
    np.testing.assert_allclose(np.asarray(split), np.asarray(eager), atol=1e-5)
    assert len(wrapper._prior_jit_cache) == 1


def test_generate_negative_text_embed_through_prior():
    """DALLE2Video.generate(negative_text_embed=...) runs the prior on the
    negative text and steers the decoder; output differs from the plain
    call with the same key, shape/finiteness hold."""
    from dalle2_video_tpu.engine.dalle2video import DALLE2Video
    from dalle2_video_tpu.models.prior import (
        DiffusionPrior, DiffusionPriorConfig, PriorNetworkConfig,
    )

    p = DiffusionPrior(
        DiffusionPriorConfig(
            network=PriorNetworkConfig(dim=EMB, depth=1, heads=2, dim_head=8),
            timesteps=10,
            sample_timesteps=3,
        )
    )
    prior_params = p.init_params(jax.random.PRNGKey(0))
    dec, dec_params = make_decoder()
    wrapper = DALLE2Video(p, dec)
    te = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    nte = jax.random.normal(jax.random.PRNGKey(9), (1, EMB))

    plain = wrapper.generate(
        prior_params, dec_params, jax.random.PRNGKey(2), te, cond_scale=2.0,
    )
    steered = wrapper.generate(
        prior_params, dec_params, jax.random.PRNGKey(2), te, cond_scale=2.0,
        negative_text_embed=nte,
    )
    assert steered.shape == (B, T, 8, 8, 3)
    assert np.isfinite(np.asarray(steered)).all()
    assert float(jnp.abs(steered - plain).max()) > 1e-6
