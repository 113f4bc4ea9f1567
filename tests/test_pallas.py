"""Pallas kernel numerics tests (interpret mode on the CPU harness;
compiled path exercised on real TPU by bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.ops.pallas.flash_mqa import flash_mqa, mqa_attention


def xla_mqa(q, k, v, scale):
    """Reference: models.layers.Attention einsum semantics."""
    sim = jnp.einsum("bnhd,bmd->bhnm", q * scale, k)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhnm,bmd->bnhd", attn, v)


@pytest.mark.parametrize("n,m", [(128, 128), (200, 130), (64, 513)])
def test_flash_mqa_matches_xla(n, m):
    d = 32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (2, n, d))
    k = jax.random.normal(kk, (2, m, d))
    v = jax.random.normal(kv, (2, m, d))
    scale = d**-0.5
    expected = jax.nn.softmax((q * scale) @ jnp.swapaxes(k, 1, 2), axis=-1) @ v
    got = flash_mqa(q, k, v, sm_scale=scale, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_mqa_attention_heads_fold():
    b, n, h, d, m = 2, 40, 4, 16, 50
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(keys[0], (b, n, h, d))
    k = jax.random.normal(keys[1], (b, m, d))
    v = jax.random.normal(keys[2], (b, m, d))
    scale = d**-0.5
    expected = xla_mqa(q, k, v, scale)
    got = mqa_attention(q, k, v, sm_scale=scale, block_q=32, block_k=32,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_flash_mqa_extreme_values_stable():
    """Online softmax must survive large logits (no inf/nan)."""
    d = 16
    q = jnp.full((1, 32, d), 30.0)
    k = jnp.full((1, 32, d), 30.0)
    v = jnp.ones((1, 32, d))
    out = flash_mqa(q, k, v, sm_scale=1.0, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)
