"""VQ-VAE for optional latent video diffusion.

Rebuild of the inherited ``VQGanVAE`` capability (dalle2-pytorch
vqgan_vae.py; reference import dalle2_video.py:14, latent hooks
:1294-1296, 1339-1358, 2151-2155, 2179, 2267-2276): frame-wise conv
encoder/decoder with a vector-quantized bottleneck, exposing the same
interface as models/vae.py (encoded_dim, get_encoded_fmap_size,
encode/decode) so VideoDecoder can run latent diffusion per stage.

TPU-first: straight-through estimator with LOSS-BASED codebook learning
by default (the van-den-Oord embed + beta*commit terms); the nearest-code
search is one big (n, K) matmul on the MXU. ``codebook_ema=True`` opts
into EMA codebook updates instead (van den Oord appendix A.1 dynamics:
decayed cluster counts + code sums with Laplace smoothing, applied by the
trainer after each generator step via ``ema_codebook_update`` — no
codebook gradients). Adversarial (PatchGAN) training lives in
train/vqgan_trainer.py + models/discriminator.py (beyond the reference,
which ships NullVQGanVAE and never trains a VAE).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dalle2_video_tpu.models.layers import SpatialConv, torch_kernel_init
from dalle2_video_tpu.models.vae import _ConvDecoder, _ConvEncoder


class VectorQuantizer(nn.Module):
    """VQ layer (van den Oord et al.): straight-through estimator. Codebook
    learned by the embed + beta*commit loss terms by default; with
    ``ema=True`` the embed term is dropped and the codebook is treated as
    a non-differentiable buffer the trainer moves with EMA statistics
    (``ema_codebook_update``)."""

    codebook_size: int = 512
    latent_dim: int = 4
    beta: float = 0.25  # commitment cost
    ema: bool = False

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """z (..., latent_dim) -> (quantized, indices, vq_loss)."""
        codebook = self.param(
            "codebook",
            nn.initializers.variance_scaling(1.0, "fan_in", "uniform"),
            (self.codebook_size, self.latent_dim),
        )
        if self.ema:
            codebook = jax.lax.stop_gradient(codebook)
        flat = z.reshape(-1, self.latent_dim)
        # nearest code by L2: one (n, K) matmul on the MXU
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ codebook.T
            + jnp.sum(codebook**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        quant = jnp.take(codebook, idx, axis=0).reshape(z.shape)

        commit = jnp.mean((jax.lax.stop_gradient(quant) - z) ** 2)
        if self.ema:
            vq_loss = self.beta * commit  # codebook moves via EMA, not grads
        else:
            embed = jnp.mean((quant - jax.lax.stop_gradient(z)) ** 2)
            vq_loss = embed + self.beta * commit

        # straight-through: gradients flow to the encoder as if identity
        quant = z + jax.lax.stop_gradient(quant - z)
        return quant, idx.reshape(z.shape[:-1]), vq_loss


def ema_codebook_update(
    codebook: jnp.ndarray,
    cluster_size: jnp.ndarray,
    embed_avg: jnp.ndarray,
    z: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    decay: float = 0.99,
    eps: float = 1e-5,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One EMA codebook step (van den Oord et al. appendix A.1).

    codebook (K, d); cluster_size (K,); embed_avg (K, d); z (..., d) the
    PRE-quantization encoder outputs; idx (...) their nearest-code indices.
    Returns (new_codebook, new_cluster_size, new_embed_avg). Pure function
    — the caller owns the stats (VQGanTrainState.vq_ema)."""
    k, dim = codebook.shape
    flat = z.reshape(-1, dim).astype(jnp.float32)
    onehot = jax.nn.one_hot(idx.reshape(-1), k, dtype=jnp.float32)  # (n, K)
    counts = jnp.sum(onehot, axis=0)  # (K,)
    sums = onehot.T @ flat  # (K, d) — one MXU matmul
    cluster_size = decay * cluster_size + (1.0 - decay) * counts
    embed_avg = decay * embed_avg + (1.0 - decay) * sums
    n = jnp.sum(cluster_size)
    smoothed = (cluster_size + eps) / (n + k * eps) * n  # Laplace smoothing
    new_codebook = (embed_avg / smoothed[:, None]).astype(codebook.dtype)
    return new_codebook, cluster_size, embed_avg


@dataclasses.dataclass(frozen=True)
class VQVAE:
    """VQGanVAE-interface VAE with a quantized bottleneck."""

    channels: int = 3
    latent_dim: int = 4
    base_dim: int = 64
    num_down: int = 2
    codebook_size: int = 512
    codebook_ema: bool = False  # EMA codebook updates instead of embed loss
    ema_decay: float = 0.99

    @property
    def encoded_dim(self) -> int:
        return self.latent_dim

    @property
    def downsample_factor(self) -> int:
        return 2**self.num_down

    def get_encoded_fmap_size(self, size: int) -> int:
        return size // self.downsample_factor

    @property
    def is_latent(self) -> bool:
        return True

    def _enc(self):
        return _ConvEncoder(self.latent_dim, self.base_dim, self.num_down)

    def _dec(self):
        return _ConvDecoder(self.channels, self.base_dim, self.num_down)

    def _vq(self):
        return VectorQuantizer(
            self.codebook_size, self.latent_dim, ema=self.codebook_ema
        )

    def init_params(self, rng, frame_size: int = 32, frames: int = 2) -> Dict[str, Any]:
        k1, k2, k3 = jax.random.split(rng, 3)
        x = jnp.zeros((1, frames, frame_size, frame_size, self.channels))
        enc = self._enc().init(k1, x)
        s = self.get_encoded_fmap_size(frame_size)
        z = jnp.zeros((1, frames, s, s, self.latent_dim))
        vq = self._vq().init(k2, z)
        dec = self._dec().init(k3, z)
        return {"encoder": enc, "vq": vq, "decoder": dec}

    def encode(self, params, video: jnp.ndarray) -> jnp.ndarray:
        """Quantized latents (b, t, s, s, latent_dim) — what diffusion sees."""
        z = self._enc().apply(params["encoder"], video)
        quant, _, _ = self._vq().apply(params["vq"], z)
        return quant

    def decode(self, params, latents: jnp.ndarray) -> jnp.ndarray:
        return self._dec().apply(params["decoder"], latents)

    def codebook_indices(self, params, video: jnp.ndarray) -> jnp.ndarray:
        z = self._enc().apply(params["encoder"], video)
        _, idx, _ = self._vq().apply(params["vq"], z)
        return idx

    # ------------------------------------------------------------------ #
    def loss(self, params, video: jnp.ndarray) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Reconstruction + VQ training loss (recon l2 + codebook/commit)."""
        z = self._enc().apply(params["encoder"], video)
        quant, _, vq_loss = self._vq().apply(params["vq"], z)
        recon = self._dec().apply(params["decoder"], quant)
        recon_loss = jnp.mean((recon - video) ** 2)
        total = recon_loss + vq_loss
        return total, {"recon": recon_loss, "vq": vq_loss}
