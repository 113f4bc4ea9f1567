"""Statistical correctness of the full sampling loops.

For Gaussian data x0 ~ N(mu, s^2) the optimal eps-predictor is closed-form:
    E[x0 | x_t] = (sqrt(acp_t) s^2 x_t + (1 - acp_t) mu) / (acp_t s^2 + 1 - acp_t)
    eps_hat(x_t, t) = (x_t - sqrt(acp_t) E[x0|x_t]) / sqrt(1 - acp_t)
Plugging this oracle into the DDPM/DDIM loops must reproduce N(mu, s^2)
marginals — an end-to-end test of p_mean_variance, the ancestral step, the
DDIM update, normalization bookkeeping, and the scan wiring (SURVEY.md §4
golden-value strategy, applied to the whole reverse process)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
from dalle2_video_tpu.models import UNet3DConfig

MU, SIGMA = 0.3, 0.5  # target marginal in [-1,1]-normalized space


def make_decoder(sample_timesteps=None):
    u = UNet3DConfig(
        dim=8, dim_mults=(1,), attn_heads=1, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4,
        init_cross_embed=False, init_conv_ksize=1,
    )
    cfg = VideoDecoderConfig(
        unets=(u,), frame_sizes=(1,), frame_numbers=(1,),
        timesteps=200, sample_timesteps=sample_timesteps,
        learned_variance=False, unconditional=True,
        clip_denoised=False,  # oracle can exceed [-1,1]; don't clamp
    )
    dec = VideoDecoder(cfg)
    sched = dec.schedules[0]

    def oracle_apply(unet_index, unet_params, x, t, **kwargs):
        acp = jnp.take(sched.alphas_cumprod, t).reshape((-1,) + (1,) * (x.ndim - 1))
        num = jnp.sqrt(acp) * SIGMA**2 * x + (1 - acp) * MU
        den = acp * SIGMA**2 + (1 - acp)
        x0_hat = num / den
        return (x - jnp.sqrt(acp) * x0_hat) / jnp.sqrt(1 - acp)

    dec._unet_apply = oracle_apply  # bypass the network with the oracle
    return dec


def _check_marginal(samples):
    # samples come back unnormalized to [0,1]: x = (z+1)/2 where z~N(MU,SIGMA)
    z = np.asarray(samples).reshape(-1) * 2.0 - 1.0
    assert z.mean() == pytest.approx(MU, abs=0.03)
    assert z.std() == pytest.approx(SIGMA, abs=0.03)


def test_ddpm_loop_reproduces_gaussian():
    dec = make_decoder()
    out = dec.p_sample_loop_ddpm(
        0, None, jax.random.PRNGKey(0), (4096, 1, 1, 1, 1)
    )
    _check_marginal(out)


def test_ddim_loop_reproduces_gaussian():
    dec = make_decoder(sample_timesteps=50)
    out = dec.p_sample_loop_ddim(
        0, None, jax.random.PRNGKey(1), (4096, 1, 1, 1, 1), timesteps=50
    )
    _check_marginal(out)


def test_ddim_eta_one_matches_ddpm_statistics():
    """Stochastic DDIM (eta=1) must match the same marginal too."""
    u = UNet3DConfig(
        dim=8, dim_mults=(1,), attn_heads=1, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4,
        init_cross_embed=False, init_conv_ksize=1,
    )
    cfg = VideoDecoderConfig(
        unets=(u,), frame_sizes=(1,), frame_numbers=(1,),
        timesteps=200, sample_timesteps=100,
        learned_variance=False, unconditional=True,
        clip_denoised=False, ddim_sampling_eta=1.0,
    )
    dec = VideoDecoder(cfg)
    sched = dec.schedules[0]

    def oracle_apply(unet_index, unet_params, x, t, **kwargs):
        acp = jnp.take(sched.alphas_cumprod, t).reshape((-1,) + (1,) * (x.ndim - 1))
        num = jnp.sqrt(acp) * SIGMA**2 * x + (1 - acp) * MU
        den = acp * SIGMA**2 + (1 - acp)
        x0_hat = num / den
        return (x - jnp.sqrt(acp) * x0_hat) / jnp.sqrt(1 - acp)

    dec._unet_apply = oracle_apply
    out = dec.p_sample_loop_ddim(
        0, None, jax.random.PRNGKey(2), (4096, 1, 1, 1, 1), timesteps=100
    )
    _check_marginal(out)


def test_ddim_terminates_at_alpha_bar_one():
    """eta=0 DDIM with a constant-x0 oracle must return EXACTLY that x0:
    the pair schedule ends at alpha_bar = 1 (t_next = -1), so no
    sqrt(1-acp[0]) residual noise survives (VERDICT r1 missing #3)."""
    C = 0.25  # constant x0 in normalized space
    u = UNet3DConfig(
        dim=8, dim_mults=(1,), attn_heads=1, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4,
        init_cross_embed=False, init_conv_ksize=1,
    )
    cfg = VideoDecoderConfig(
        unets=(u,), frame_sizes=(1,), frame_numbers=(1,),
        timesteps=200, sample_timesteps=10,
        learned_variance=False, unconditional=True, clip_denoised=False,
    )
    dec = VideoDecoder(cfg)
    sched = dec.schedules[0]

    def oracle_apply(unet_index, unet_params, x, t, **kwargs):
        acp = jnp.take(sched.alphas_cumprod, t).reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(acp) * C) / jnp.sqrt(1 - acp)  # eps for x0 == C

    dec._unet_apply = oracle_apply
    out = dec.p_sample_loop_ddim(
        0, None, jax.random.PRNGKey(3), (64, 1, 1, 1, 1), timesteps=10
    )
    z = np.asarray(out) * 2.0 - 1.0
    np.testing.assert_allclose(z, C, atol=1e-5)


def test_dpmpp_loop_reproduces_gaussian():
    """DPM-Solver++(2M) with the exact-score oracle reproduces the data
    marginal at 16 steps (DDIM needs ~50 for the same tolerance here)."""
    dec = make_decoder(sample_timesteps=16)
    out = dec.p_sample_loop_dpmpp(
        0, None, jax.random.PRNGKey(4), (4096, 1, 1, 1, 1), timesteps=16
    )
    _check_marginal(out)


def test_dpmpp_terminates_exactly_at_x0():
    """Constant-x0 oracle: lower_order_final + the terminal alpha_bar = 1
    step must return EXACTLY the data prediction (like the DDIM loop)."""
    C = 0.25
    u = UNet3DConfig(
        dim=8, dim_mults=(1,), attn_heads=1, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4,
        init_cross_embed=False, init_conv_ksize=1,
    )
    cfg = VideoDecoderConfig(
        unets=(u,), frame_sizes=(1,), frame_numbers=(1,),
        timesteps=200, sample_timesteps=6, sampler="dpmpp",
        learned_variance=False, unconditional=True, clip_denoised=False,
    )
    dec = VideoDecoder(cfg)
    sched = dec.schedules[0]

    def oracle_apply(unet_index, unet_params, x, t, **kwargs):
        acp = jnp.take(sched.alphas_cumprod, t).reshape((-1,) + (1,) * (x.ndim - 1))
        return (x - jnp.sqrt(acp) * C) / jnp.sqrt(1 - acp)

    dec._unet_apply = oracle_apply
    out = dec.p_sample_loop_dpmpp(
        0, None, jax.random.PRNGKey(5), (64, 1, 1, 1, 1), timesteps=6
    )
    z = np.asarray(out) * 2.0 - 1.0
    np.testing.assert_allclose(z, C, atol=1e-5)


def test_dpmpp_more_accurate_than_ddim_at_few_steps():
    """Second-order accuracy: at 8 steps the 2M solver's marginal moments
    sit closer to the target than eta=0 DDIM's on the same grid."""
    def moments(loop_name, steps):
        dec = make_decoder(sample_timesteps=steps)
        loop = getattr(dec, loop_name)
        out = loop(0, None, jax.random.PRNGKey(6), (8192, 1, 1, 1, 1),
                   timesteps=steps)
        z = np.asarray(out).reshape(-1) * 2.0 - 1.0
        return abs(z.mean() - MU) + abs(z.std() - SIGMA)

    err_dpmpp = moments("p_sample_loop_dpmpp", 8)
    err_ddim = moments("p_sample_loop_ddim", 8)
    assert err_dpmpp < err_ddim, (err_dpmpp, err_ddim)


def test_sample_stage_uses_configured_sampler():
    """cfg.sampler='dpmpp' routes sample_stage's few-step path through the
    2M loop (smoke through the public sampling surface)."""
    u = UNet3DConfig(
        dim=8, dim_mults=(1,), attn_heads=1, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4,
        init_cross_embed=False, init_conv_ksize=1,
    )
    cfg = VideoDecoderConfig(
        unets=(u,), frame_sizes=(8,), frame_numbers=(2,),
        timesteps=50, sample_timesteps=4, sampler="dpmpp",
        learned_variance=False, unconditional=True,
    )
    dec = VideoDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    out = dec.sample(params, jax.random.PRNGKey(1), batch_size=2)
    assert out.shape == (2, 2, 8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()
