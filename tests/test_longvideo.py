"""Long-video generation (engine/longvideo.py): autoregressive
sliding-window extension of a fixed-window decoder.

Beyond-reference capability: the reference can only sample clips at the
training frame count (/root/reference/dalle2_video/dalle2_video.py:
2053-2186); here a T-frame decoder generates arbitrary n_frames by
chaining the conditional-generation (inpainting) path with each window's
leading `overlap` frames clamped to the tail already generated.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
from dalle2_video_tpu.engine.longvideo import generate_long_video
from dalle2_video_tpu.models import UNet3DConfig
from dalle2_video_tpu.utils import keys as keyutil

B, T, S = 2, 4, 8
EMB = 16


def tiny_decoder():
    cfg = VideoDecoderConfig(
        unets=(
            UNet3DConfig(
                dim=8,
                dim_mults=(1, 2),
                attn_heads=2,
                attn_dim_head=4,
                num_resnet_blocks=1,
                resnet_groups=4,
                video_embed_dim=EMB,
                init_cross_embed=False,
                init_conv_ksize=3,
            ),
        ),
        frame_sizes=(S,),
        frame_numbers=(T,),
        timesteps=10,
        sample_timesteps=(3,),
        learned_variance=False,
        sampler="ddim",
    )
    dec = VideoDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    # perturb: a zero-init output conv ignores its input, so the known
    # frames couldn't influence the generated ones otherwise
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.05 * rng.standard_normal(p.shape).astype(p.dtype),
        params,
    )
    return dec, params


def test_shape_and_range():
    """n_frames not divisible by the stride: schedule covers and trims."""
    dec, params = tiny_decoder()
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    out = generate_long_video(
        dec, params, jax.random.PRNGKey(2),
        n_frames=9, overlap=2, video_embed=emb,
    )
    assert out.shape == (B, 9, S, S, 3)
    assert bool(jnp.isfinite(out).all())
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0


def test_first_window_is_plain_sample():
    """The first T frames are exactly a plain cascade sample under the
    first window key — the schedule adds windows, it does not change
    what a single window computes."""
    dec, params = tiny_decoder()
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    rng = jax.random.PRNGKey(3)
    long = generate_long_video(
        dec, params, rng, n_frames=T + 2, overlap=2, video_embed=emb,
    )
    k0 = keyutil.split(rng, 2)[0]
    direct = dec.sample(params, k0, video_embed=emb)
    np.testing.assert_allclose(
        np.asarray(long[:, :T]), np.asarray(direct), rtol=0, atol=1e-6
    )


def test_exact_window_length_is_one_window():
    """n_frames == T degenerates to a single plain sample (no inpaint
    windows, key schedule of length 1)."""
    dec, params = tiny_decoder()
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    rng = jax.random.PRNGKey(4)
    long = generate_long_video(
        dec, params, rng, n_frames=T, overlap=1, video_embed=emb,
    )
    direct = dec.sample(params, keyutil.split(rng, 1)[0], video_embed=emb)
    np.testing.assert_allclose(np.asarray(long), np.asarray(direct), atol=1e-6)


def test_deterministic_and_key_sensitive():
    dec, params = tiny_decoder()
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    a = generate_long_video(
        dec, params, jax.random.PRNGKey(5), n_frames=8, overlap=2,
        video_embed=emb,
    )
    b = generate_long_video(
        dec, params, jax.random.PRNGKey(5), n_frames=8, overlap=2,
        video_embed=emb,
    )
    c = generate_long_video(
        dec, params, jax.random.PRNGKey(6), n_frames=8, overlap=2,
        video_embed=emb,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.max(jnp.abs(a - c))) > 1e-4


def test_per_row_keys_row_pure():
    """Batched per-row keys: each row of the long video is a pure function
    of its own key — swapping (key, embed) rows swaps outputs exactly."""
    dec, params = tiny_decoder()
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    rows = keyutil.batch_keys([11, 22])
    out = generate_long_video(
        dec, params, rows, n_frames=8, overlap=2, video_embed=emb,
    )
    out_sw = generate_long_video(
        dec, params, rows[::-1], n_frames=8, overlap=2,
        video_embed=emb[::-1],
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_sw[::-1]), atol=1e-6
    )


def test_validation_errors():
    dec, params = tiny_decoder()
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, EMB))
    with pytest.raises(ValueError, match="overlap"):
        generate_long_video(
            dec, params, jax.random.PRNGKey(0), n_frames=8, overlap=T,
            video_embed=emb,
        )
    with pytest.raises(ValueError, match="n_frames"):
        generate_long_video(
            dec, params, jax.random.PRNGKey(0), n_frames=T - 1, overlap=1,
            video_embed=emb,
        )


def test_dalle2video_generate_long():
    """Text -> long video through the prior + sliding-window decoder."""
    from dalle2_video_tpu.engine.dalle2video import DALLE2Video
    from dalle2_video_tpu.models.prior import (
        DiffusionPrior,
        DiffusionPriorConfig,
        PriorNetworkConfig,
    )

    dec, dparams = tiny_decoder()
    pcfg = DiffusionPriorConfig(
        network=PriorNetworkConfig(
            dim=EMB, depth=1, heads=2, dim_head=8,
            cond_on_text_encodings=False,
        ),
        timesteps=10,
        sample_timesteps=3,
    )
    prior = DiffusionPrior(pcfg)
    pparams = prior.init_params(jax.random.PRNGKey(0))
    d2v = DALLE2Video(prior, dec, prior_num_samples=2)
    text_embed = jax.random.normal(jax.random.PRNGKey(9), (B, EMB))
    out = d2v.generate_long(
        pparams, dparams, jax.random.PRNGKey(10), text_embed,
        n_frames=T + 2, overlap=2,
    )
    assert out.shape == (B, T + 2, S, S, 3)
    assert bool(jnp.isfinite(out).all())
