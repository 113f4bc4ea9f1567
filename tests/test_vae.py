"""VAE interface tests: NullVAE, ConvVAE, VQVAE, and latent diffusion
through VideoDecoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.models.vae import ConvVAE, NullVAE
from dalle2_video_tpu.models.vqvae import VQVAE


def test_null_vae_identity():
    v = NullVAE(channels=3)
    x = jnp.ones((1, 2, 8, 8, 3))
    assert v.encode(None, x) is x
    assert v.decode(None, x) is x
    assert v.encoded_dim == 3
    assert v.get_encoded_fmap_size(64) == 64


def test_conv_vae_shapes():
    v = ConvVAE(latent_dim=4, base_dim=8, num_down=2)
    params = v.init_params(jax.random.PRNGKey(0), frame_size=16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 16, 16, 3))
    z = v.encode(params, x)
    assert z.shape == (2, 3, 4, 4, 4)
    rec = v.decode(params, z)
    assert rec.shape == x.shape


def test_vqvae_quantization_and_loss():
    v = VQVAE(latent_dim=4, base_dim=8, num_down=1, codebook_size=16)
    params = v.init_params(jax.random.PRNGKey(0), frame_size=8)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 2, 8, 8, 3))
    z = v.encode(params, x)
    assert z.shape == (2, 2, 4, 4, 4)
    # quantized latents take values from the codebook
    idx = v.codebook_indices(params, x)
    assert idx.shape == (2, 2, 4, 4)
    assert int(idx.max()) < 16
    codebook = params["vq"]["params"]["codebook"]
    np.testing.assert_allclose(
        np.asarray(z.reshape(-1, 4)),
        np.asarray(jnp.take(codebook, idx.reshape(-1), axis=0)),
        atol=1e-6,
    )
    total, parts = v.loss(params, x)
    assert np.isfinite(float(total))
    # straight-through: encoder receives gradient
    g = jax.grad(lambda p: v.loss(p, x)[0])(params)
    enc_leaves = jax.tree_util.tree_leaves(g["encoder"])
    assert any(float(jnp.abs(l).max()) > 0 for l in enc_leaves)


def test_latent_diffusion_through_decoder():
    """VideoDecoder with a VQVAE stage: loss + sampling in latent space."""
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig

    vae = VQVAE(latent_dim=4, base_dim=8, num_down=1, codebook_size=16)
    u = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=16,
        init_cross_embed=False, init_conv_ksize=3,
    )
    dec = VideoDecoder(
        VideoDecoderConfig(
            unets=(u,), frame_sizes=(8,), frame_numbers=(2,),
            timesteps=10, learned_variance=False,
        ),
        vaes=(vae,),
    )
    # unet channels follow the vae latent dim
    assert dec.unet_configs[0].channels == 4
    params = dec.init_params(jax.random.PRNGKey(0))
    assert "vae_0" in params
    video = jax.random.uniform(jax.random.PRNGKey(1), (2, 2, 8, 8, 3))
    emb = jnp.zeros((2, 16))
    loss = dec.loss(params, jax.random.PRNGKey(2), video, video_embed=emb)
    assert np.isfinite(float(loss))
    vid = dec.sample(params, jax.random.PRNGKey(3), video_embed=emb)
    assert vid.shape == (2, 2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(vid)))
