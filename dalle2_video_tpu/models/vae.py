"""VAE interface for optional latent diffusion.

Reference capability: ``VQGanVAE`` / ``NullVQGanVAE`` from dalle2-pytorch
(import at reference dalle2_video.py:14; used :1294-1296, 1339-1358,
2151-2155, 2179, 2267-2276). The shipped recipe runs pixel-space (Null VAE);
we provide the same interface plus a trainable conv VAE for latent diffusion.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dalle2_video_tpu.models.layers import SpatialConv, torch_kernel_init


@dataclasses.dataclass(frozen=True)
class NullVAE:
    """Identity VAE: pixel-space diffusion (reference NullVQGanVAE)."""

    channels: int = 3

    @property
    def encoded_dim(self) -> int:
        return self.channels

    @property
    def downsample_factor(self) -> int:
        return 1

    def get_encoded_fmap_size(self, size: int) -> int:
        return size

    def encode(self, params, video: jnp.ndarray) -> jnp.ndarray:
        return video

    def decode(self, params, latents: jnp.ndarray) -> jnp.ndarray:
        return latents

    def init_params(self, rng):
        return None

    @property
    def is_latent(self) -> bool:
        return False


class _ConvEncoder(nn.Module):
    latent_dim: int
    base_dim: int
    num_down: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_down):
            x = SpatialConv(self.base_dim * (2**i), 4, stride=2, name=f"down{i}")(x)
            x = nn.silu(x)
        return SpatialConv(self.latent_dim, 3, name="to_latent")(x)


class _ConvDecoder(nn.Module):
    channels: int
    base_dim: int
    num_down: int

    @nn.compact
    def __call__(self, z):
        x = SpatialConv(self.base_dim * (2 ** (self.num_down - 1)), 3, name="from_latent")(z)
        for i in reversed(range(self.num_down)):
            b, t, h, w, c = x.shape
            x = jax.image.resize(x, (b, t, h * 2, w * 2, c), method="nearest")
            x = SpatialConv(self.base_dim * (2**i), 3, name=f"up{i}")(x)
            x = nn.silu(x)
        return SpatialConv(self.channels, 3, name="to_out")(x)


@dataclasses.dataclass(frozen=True)
class ConvVAE:
    """Simple frame-wise conv autoencoder with the VQGanVAE interface shape.

    Space-only (per-frame) like the reference's temporal_apply(vae.encode)
    usage (dalle2_video.py:2271-2276): no temporal mixing.
    """

    channels: int = 3
    latent_dim: int = 4
    base_dim: int = 64
    num_down: int = 2  # downsample factor = 2**num_down

    @property
    def encoded_dim(self) -> int:
        return self.latent_dim

    @property
    def downsample_factor(self) -> int:
        return 2**self.num_down

    def get_encoded_fmap_size(self, size: int) -> int:
        return size // self.downsample_factor

    def _enc(self):
        return _ConvEncoder(self.latent_dim, self.base_dim, self.num_down)

    def _dec(self):
        return _ConvDecoder(self.channels, self.base_dim, self.num_down)

    def init_params(self, rng, frame_size: int = 32, frames: int = 2):
        k1, k2 = jax.random.split(rng)
        x = jnp.zeros((1, frames, frame_size, frame_size, self.channels))
        enc = self._enc().init(k1, x)
        z = jnp.zeros(
            (1, frames, self.get_encoded_fmap_size(frame_size),
             self.get_encoded_fmap_size(frame_size), self.latent_dim)
        )
        dec = self._dec().init(k2, z)
        return {"encoder": enc, "decoder": dec}

    def encode(self, params, video: jnp.ndarray) -> jnp.ndarray:
        return self._enc().apply(params["encoder"], video)

    def decode(self, params, latents: jnp.ndarray) -> jnp.ndarray:
        return self._dec().apply(params["decoder"], latents)

    @property
    def is_latent(self) -> bool:
        return True
