"""Gaussian diffusion schedule — the pure-function DDPM math core.

TPU-native equivalent of the inherited ``dalle2_pytorch.NoiseScheduler``
(constructed at reference ``dalle2_video/dalle2_video.py:1388-1394`` and used
throughout ``p_losses`` / ``p_mean_variance`` / sampling, ``:1551-2051``).

Design: a frozen dataclass of precomputed f32 buffers + pure ``jnp`` functions.
Everything is shape-static and jit/scan/vmap friendly; no Python control flow
depends on traced values. All buffers are computed in float64-free numpy f64
then stored as f32 jnp arrays (matching torch's f64->f32 register_buffer path).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "make_beta_schedule",
    "DiffusionSchedule",
    "normal_kl",
    "approx_standard_normal_cdf",
    "discretized_gaussian_log_likelihood",
    "NAT",
]

# nats <-> bits conversion used by the Improved-DDPM VLB term.
NAT = 1.0 / np.log(2.0)


def make_beta_schedule(name: str, timesteps: int) -> np.ndarray:
    """β schedules, numerically identical to dalle2-pytorch's versions.

    Supported: ``cosine`` (Nichol & Dhariwal s=0.008), ``linear``,
    ``quadratic``, ``jsd`` (1/T, ..., 1/1), ``sqrt``.
    """
    if name == "cosine":
        s = 0.008
        steps = timesteps + 1
        x = np.linspace(0, timesteps, steps, dtype=np.float64)
        alphas_cumprod = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
        alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
        betas = 1.0 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
        return np.clip(betas, 0.0, 0.999)

    scale = 1000.0 / timesteps
    beta_start = scale * 0.0001
    beta_end = scale * 0.02

    if name == "linear":
        betas = np.linspace(beta_start, beta_end, timesteps, dtype=np.float64)
    elif name == "quadratic":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, timesteps, dtype=np.float64) ** 2
        )
    elif name == "jsd":
        betas = 1.0 / np.linspace(timesteps, 1, timesteps, dtype=np.float64)
    elif name == "sqrt":
        betas = np.sqrt(np.linspace(beta_start, beta_end, timesteps, dtype=np.float64))
    else:
        raise ValueError(f"unknown beta schedule {name!r}")
    # safety clip: the reference's 1000/T scaling makes beta exceed 1 for
    # tiny T (NaN alphas); a no-op at production timesteps (max beta 0.02
    # at T=1000)
    return np.clip(betas, 0.0, 0.999)


def _extract(buf: jnp.ndarray, t: jnp.ndarray, broadcast_ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and reshape to broadcast against x.

    ``buf``: (T,) schedule buffer; ``t``: (b,) int32 timesteps;
    returns (b, 1, 1, ..., 1) with ``broadcast_ndim`` total dims.
    """
    out = jnp.take(buf, t, axis=0)
    return out.reshape(out.shape + (1,) * (broadcast_ndim - 1))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """Precomputed DDPM buffers + the q/p math as pure methods.

    All fields are (T,) f32 arrays (leaves), except the static metadata.
    Being a registered dataclass pytree, a schedule can be closed over or
    passed through jit/scan boundaries freely.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    p2_loss_weight: jnp.ndarray
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))
    loss_type: str = dataclasses.field(metadata=dict(static=True))

    # ------------------------------------------------------------------ #
    # construction
    # ------------------------------------------------------------------ #
    @staticmethod
    def create(
        beta_schedule: str = "cosine",
        timesteps: int = 1000,
        loss_type: str = "l2",
        p2_loss_weight_gamma: float = 0.0,
        p2_loss_weight_k: float = 1.0,
    ) -> "DiffusionSchedule":
        betas = make_beta_schedule(beta_schedule, timesteps)
        alphas = 1.0 - betas
        alphas_cumprod = np.cumprod(alphas)
        alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])

        posterior_variance = (
            betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        )
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return DiffusionSchedule(
            betas=f32(betas),
            alphas_cumprod=f32(alphas_cumprod),
            alphas_cumprod_prev=f32(alphas_cumprod_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
            # floor keeps the reciprocal buffers finite when a schedule hits
            # alpha_cumprod == 0 exactly (e.g. linear with few timesteps);
            # values match the reference wherever the reference is finite
            sqrt_recip_alphas_cumprod=f32(
                np.sqrt(1.0 / np.maximum(alphas_cumprod, 1e-20))
            ),
            sqrt_recipm1_alphas_cumprod=f32(
                np.sqrt(1.0 / np.maximum(alphas_cumprod, 1e-20) - 1.0)
            ),
            posterior_variance=f32(posterior_variance),
            posterior_log_variance_clipped=f32(
                np.log(np.clip(posterior_variance, 1e-20, None))
            ),
            posterior_mean_coef1=f32(
                betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
            ),
            posterior_mean_coef2=f32(
                (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
            ),
            p2_loss_weight=f32(
                (p2_loss_weight_k + alphas_cumprod / (1.0 - alphas_cumprod))
                ** -p2_loss_weight_gamma
            ),
            num_timesteps=int(timesteps),
            loss_type=str(loss_type),
        )

    # ------------------------------------------------------------------ #
    # forward process q
    # ------------------------------------------------------------------ #
    def sample_random_times(self, rng: jax.Array, batch: int) -> jnp.ndarray:
        return jax.random.randint(rng, (batch,), 0, self.num_timesteps, dtype=jnp.int32)

    def q_sample(
        self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
    ) -> jnp.ndarray:
        nd = x_start.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def q_sample_from_to(
        self,
        x_from: jnp.ndarray,
        from_t: jnp.ndarray,
        to_t: jnp.ndarray,
        noise: jnp.ndarray,
    ) -> jnp.ndarray:
        """Renoise a sample from a lower to a higher noise level (repaint).

        Divergence from dalle2-pytorch (documented per SURVEY.md §2e policy):
        the inherited implementation combines the noise std *linearly*
        (``sigma_to - sigma_from * a_to/a_from``), which under-disperses and
        does not reproduce the q(x_to | x_0) marginal. We use the quadrature
        combination, which does: Var = 1 - acp_to stays exact.
        """
        nd = x_from.ndim
        alpha_ratio = _extract(self.sqrt_alphas_cumprod, to_t, nd) / _extract(
            self.sqrt_alphas_cumprod, from_t, nd
        )
        var_from = 1.0 - _extract(self.alphas_cumprod, from_t, nd)
        var_to = 1.0 - _extract(self.alphas_cumprod, to_t, nd)
        sigma = jnp.sqrt(jnp.maximum(var_to - alpha_ratio**2 * var_from, 0.0))
        return x_from * alpha_ratio + noise * sigma

    def q_posterior(self, x_start: jnp.ndarray, x_t: jnp.ndarray, t: jnp.ndarray):
        """Posterior q(x_{t-1} | x_t, x_0): (mean, variance, log_variance)."""
        nd = x_t.ndim
        mean = (
            _extract(self.posterior_mean_coef1, t, nd) * x_start
            + _extract(self.posterior_mean_coef2, t, nd) * x_t
        )
        var = _extract(self.posterior_variance, t, nd)
        log_var = _extract(self.posterior_log_variance_clipped, t, nd)
        return mean, var, log_var

    # ------------------------------------------------------------------ #
    # parameterization conversions (eps <-> x0 <-> v)
    # ------------------------------------------------------------------ #
    def predict_start_from_noise(self, x_t, t, noise):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * noise
        )

    def predict_noise_from_start(self, x_t, t, x0):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t - x0
        ) / _extract(self.sqrt_recipm1_alphas_cumprod, t, nd)

    def calculate_v(self, x_start, t, noise):
        nd = x_start.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * noise
            - _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * x_start
        )

    def predict_start_from_v(self, x_t, t, v):
        nd = x_t.ndim
        return (
            _extract(self.sqrt_alphas_cumprod, t, nd) * x_t
            - _extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * v
        )

    # ------------------------------------------------------------------ #
    # losses
    # ------------------------------------------------------------------ #
    def loss_fn(self, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
        """Elementwise l1 / l2 / huber(delta=1) loss, no reduction."""
        if self.loss_type == "l1":
            return jnp.abs(pred - target)
        if self.loss_type == "l2":
            return (pred - target) ** 2
        if self.loss_type == "huber":
            d = pred - target
            ad = jnp.abs(d)
            return jnp.where(ad < 1.0, 0.5 * d * d, ad - 0.5)
        raise ValueError(f"unknown loss type {self.loss_type!r}")

    def p2_reweigh_loss(self, loss: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        return loss * _extract(self.p2_loss_weight, t, loss.ndim)


# ---------------------------------------------------------------------- #
# Improved-DDPM VLB helpers (reference usage: dalle2_video.py:2033-2045)
# ---------------------------------------------------------------------- #
def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, var1) || N(mean2, var2)) per element, in nats."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    return 0.5 * (
        1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales, thres: float = 0.999):
    """Log-likelihood of an image discretized to 256 bins under a Gaussian.

    Matches Ho et al.'s diffusion_utils_2 implementation (used via
    dalle2-pytorch at reference dalle2_video.py:2039-2042).
    """
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)

    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min

    return jnp.where(
        x < -thres,
        log_cdf_plus,
        jnp.where(
            x > thres,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        ),
    )
