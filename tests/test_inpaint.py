"""Conditional generation (inpainting) tests: video extension, temporal
interpolation, and spatial inpainting through every sampler loop.

The replacement method (Video Diffusion Models §4 baseline / RePaint eq. 8)
re-noises the known video to the sampler's current noise level and overwrites
the masked region each step; at the terminal step alpha-bar = 1, so the known
region of the output must equal the conditioning video EXACTLY — that is the
main invariant tested here. "guided" adds VDM eq. 7 reconstruction guidance
on top (it steers the UNKNOWN region through the denoiser's Jacobian; the
known region is still pinned by replacement).

Beyond-reference feature: the reference's sample() is unconditional-from-
noise only (/root/reference/dalle2_video/dalle2_video.py:2053-2186).
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


def single_stage(sampler="ddim", sample_timesteps=4, timesteps=10, perturb=False):
    cfg = VideoDecoderConfig(
        unets=(tiny_unet(),),
        frame_sizes=(8,),
        frame_numbers=(T,),
        timesteps=timesteps,
        sample_timesteps=None if sample_timesteps is None else (sample_timesteps,),
        learned_variance=False,
        sampler=sampler,
    )
    dec = VideoDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    if perturb:
        # the zero-init output conv makes an untrained net's prediction
        # independent of its input; perturb so the denoiser Jacobian (and
        # hence reconstruction guidance) is non-trivial
        rng = np.random.RandomState(0)
        params = jax.tree_util.tree_map(
            lambda p: p + 0.05 * rng.standard_normal(p.shape).astype(p.dtype),
            params,
        )
    return dec, params


def known_and_mask():
    known = jax.random.uniform(jax.random.PRNGKey(7), (B, T, 8, 8, 3))
    mask = np.zeros((B, T, 1, 1, 1), np.float32)
    mask[:, 0] = 1.0  # frame 0 known -> video extension
    return known, jnp.asarray(mask)


@pytest.mark.parametrize(
    "sampler,st",
    [("ddim", None), ("ddim", 4), ("dpmpp", 4)],
    ids=["ddpm", "ddim", "dpmpp"],
)
def test_known_region_exact_every_sampler(sampler, st):
    """Replacement inpainting: the known frames of the output equal the
    conditioning video exactly at the terminal step, in all three loops
    (DDPM ancestral, DDIM, DPM-Solver++), and the unknown frames are
    actually generated. Perturbed params: a zero-init output conv ignores
    its input, so the known frames couldn't influence the generated ones."""
    dec, params = single_stage(sampler=sampler, sample_timesteps=st, perturb=True)
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    known, mask = known_and_mask()

    out = dec.sample(
        params, jax.random.PRNGKey(3), video_embed=emb,
        inpaint_video=known, inpaint_mask=mask,
    )
    assert out.shape == (B, T, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(known[:, 0]), atol=1e-5
    )
    # the generated frame is not a copy of the conditioning video
    assert float(jnp.abs(out[:, 1] - known[:, 1]).max()) > 1e-3
    # and differs from the unconditional sample with the same key (the
    # constraint propagated through the loop, not just the final overwrite)
    free = dec.sample(params, jax.random.PRNGKey(3), video_embed=emb)
    assert float(jnp.abs(out[:, 1] - free[:, 1]).max()) > 1e-6


def test_spatial_inpaint_broadcast_mask():
    """A broadcastable (1, 1, H, W, 1) mask inpaints a spatial region of
    every frame; the known half is exact."""
    dec, params = single_stage()
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    known = jax.random.uniform(jax.random.PRNGKey(7), (B, T, 8, 8, 3))
    mask = np.zeros((1, 1, 8, 8, 1), np.float32)
    mask[:, :, :, :4] = 1.0  # left half known
    out = dec.sample(
        params, jax.random.PRNGKey(3), video_embed=emb,
        inpaint_video=known, inpaint_mask=jnp.asarray(mask),
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :, :, :4]), np.asarray(known[:, :, :, :4]), atol=1e-5
    )
    assert float(jnp.abs(out[:, :, :, 4:] - known[:, :, :, 4:]).max()) > 1e-3


def test_guided_inpaint_steers_unknown_region():
    """VDM eq. 7 reconstruction guidance: same key, method='guided' vs
    'replace' — the known region stays exact (replacement still pins it),
    while the guidance gradient changes the generated region."""
    dec, params = single_stage(perturb=True)
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    known, mask = known_and_mask()

    rep = dec.sample(
        params, jax.random.PRNGKey(3), video_embed=emb,
        inpaint_video=known, inpaint_mask=mask, inpaint_method="replace",
    )
    gui = dec.sample(
        params, jax.random.PRNGKey(3), video_embed=emb,
        inpaint_video=known, inpaint_mask=mask, inpaint_method="guided",
        inpaint_guidance_weight=50.0,
    )
    assert np.isfinite(np.asarray(gui)).all()
    np.testing.assert_allclose(
        np.asarray(gui[:, 0]), np.asarray(known[:, 0]), atol=1e-5
    )
    assert float(jnp.abs(gui[:, 1] - rep[:, 1]).max()) > 1e-5


def test_cascade_reapplies_constraint_per_stage():
    """Two-stage cascade: the conditioning video is resized to each stage's
    geometry and re-applied, so the FINAL output's known frames match the
    conditioning video at the final resolution."""
    cfg = VideoDecoderConfig(
        unets=(tiny_unet(), tiny_unet()),
        frame_sizes=(8, 16),
        frame_numbers=(T, T),
        timesteps=10,
        sample_timesteps=(None, 4),
        learned_variance=False,
        use_noise_for_lowres_cond=True,
    )
    dec = VideoDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    known = jax.random.uniform(jax.random.PRNGKey(7), (B, T, 16, 16, 3))
    mask = np.zeros((B, T, 1, 1, 1), np.float32)
    mask[:, 0] = 1.0
    out = dec.sample(
        params, jax.random.PRNGKey(3), video_embed=emb,
        inpaint_video=known, inpaint_mask=jnp.asarray(mask),
    )
    assert out.shape == (B, T, 16, 16, 3)
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(known[:, 0]), atol=1e-5
    )
    assert float(jnp.abs(out[:, 1] - known[:, 1]).max()) > 1e-3


def test_chunked_inpaint_per_row_keys_invariance():
    """max_batch_size chunking with a shared broadcastable mask: identical
    to the unchunked run under per-row keys, and still exact on the known
    region (exercises the take/take_mask chunk slicing)."""
    from dalle2_video_tpu.utils import keys as keyutil

    dec, params = single_stage()
    n = 3
    emb = jax.random.normal(jax.random.PRNGKey(1), (n, EMB))
    known = jax.random.uniform(jax.random.PRNGKey(7), (n, T, 8, 8, 3))
    mask = np.zeros((1, T, 1, 1, 1), np.float32)
    mask[:, 0] = 1.0
    mask = jnp.asarray(mask)
    rows = keyutil.batch_keys([11, 22, 33])

    full = dec.sample(
        params, rows, video_embed=emb, inpaint_video=known, inpaint_mask=mask
    )
    chunked = dec.sample(
        params, rows, video_embed=emb, inpaint_video=known, inpaint_mask=mask,
        max_batch_size=2,
    )
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(full[:, 0]), np.asarray(known[:, 0]), atol=1e-5
    )


def test_latent_stage_pools_mask_and_runs():
    """Latent stage: the known video is VAE-encoded and the pixel mask is
    min-pooled to the latent grid (a latent cell is known only if its whole
    f x f patch is known). Exactness in pixel space cannot hold through a
    lossy VQ decode — assert the path runs, shapes are right, and output is
    finite; mask-less inpainting asserts."""
    from dalle2_video_tpu.models.vqvae import VQVAE

    vae = VQVAE(latent_dim=4, base_dim=8, num_down=1, codebook_size=16)
    u = tiny_unet()
    dec = VideoDecoder(
        VideoDecoderConfig(
            unets=(u,), frame_sizes=(8,), frame_numbers=(T,),
            timesteps=10, sample_timesteps=(4,), learned_variance=False,
        ),
        vaes=(vae,),
    )
    params = dec.init_params(jax.random.PRNGKey(0))
    emb = jnp.zeros((B, EMB))
    known = jax.random.uniform(jax.random.PRNGKey(7), (B, T, 8, 8, 3))
    # left 5 columns known: latent col 0 fully known, col 2 (cols 4:6)
    # only half known -> must pool to 0 (min), not 0.5
    mask = np.zeros((B, T, 8, 8, 1), np.float32)
    mask[:, :, :, :5] = 1.0
    out = dec.sample(
        params, jax.random.PRNGKey(3), video_embed=emb,
        inpaint_video=known, inpaint_mask=jnp.asarray(mask),
    )
    assert out.shape == (B, T, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()

    with pytest.raises(AssertionError):
        dec.sample(
            params, jax.random.PRNGKey(3), video_embed=emb,
            inpaint_video=known,
        )


def test_generate_passes_inpaint_through():
    """DALLE2Video.generate forwards sampling kwargs to decoder.sample:
    known frames exact through the full prior+decoder wrapper."""
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
    dec, dec_params = single_stage()
    wrapper = DALLE2Video(p, dec)
    te = jax.random.normal(jax.random.PRNGKey(1), (B, EMB))
    known, mask = known_and_mask()
    vid = wrapper.generate(
        prior_params, dec_params, jax.random.PRNGKey(2), te,
        inpaint_video=known, inpaint_mask=mask,
    )
    assert vid.shape == (B, T, 8, 8, 3)
    np.testing.assert_allclose(
        np.asarray(vid[:, 0]), np.asarray(known[:, 0]), atol=1e-5
    )
