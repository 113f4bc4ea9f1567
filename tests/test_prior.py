"""Diffusion prior + DALLE2Video end-to-end tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.models.prior import (
    DiffusionPrior,
    DiffusionPriorConfig,
    PriorNetworkConfig,
)

D = 16


@pytest.fixture(scope="module")
def prior():
    cfg = DiffusionPriorConfig(
        network=PriorNetworkConfig(dim=D, depth=2, heads=2, dim_head=8),
        timesteps=20,
        sample_timesteps=5,
    )
    p = DiffusionPrior(cfg)
    params = p.init_params(jax.random.PRNGKey(0))
    return p, params


def test_prior_loss(prior):
    p, params = prior
    ve = jax.random.normal(jax.random.PRNGKey(1), (4, D))
    te = jax.random.normal(jax.random.PRNGKey(2), (4, D))
    loss = p.loss(params, jax.random.PRNGKey(3), ve, te)
    assert np.isfinite(float(loss))
    g = jax.grad(lambda pp: p.loss(pp, jax.random.PRNGKey(3), ve, te))(params)
    assert all(
        np.all(np.isfinite(np.asarray(l))) for l in jax.tree_util.tree_leaves(g)
    )


def test_prior_sample_shapes_and_rerank(prior):
    p, params = prior
    te = jax.random.normal(jax.random.PRNGKey(2), (3, D))
    out = p.sample(params, jax.random.PRNGKey(4), te, num_samples_per_batch=2,
                   cond_scale=2.0)
    assert out.shape == (3, D)
    assert np.all(np.isfinite(np.asarray(out)))


def test_prior_best_of_n_picks_highest_similarity(prior):
    """With N candidates, the reranker must return the argmax-similarity one."""
    p, params = prior
    te = jax.random.normal(jax.random.PRNGKey(5), (2, D))
    n = 4
    rep = jnp.repeat(te, n, axis=0)
    embeds = p.sample_loop(params, jax.random.PRNGKey(6), rep).reshape(2, n, D)
    from dalle2_video_tpu.utils.contrastive import l2_normalize

    sims = jnp.einsum("bd,bnd->bn", l2_normalize(te), l2_normalize(embeds, axis=-1))
    # same rng path through .sample
    out = p.sample(params, jax.random.PRNGKey(6), te, num_samples_per_batch=n)
    expected = jnp.take_along_axis(
        embeds, jnp.argmax(sims, axis=-1)[:, None, None], axis=1
    ).squeeze(1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


def test_prior_self_cond_and_text_encodings():
    cfg = DiffusionPriorConfig(
        network=PriorNetworkConfig(
            dim=D, depth=1, heads=2, dim_head=8,
            cond_on_text_encodings=True, text_encoding_dim=12, self_cond=True,
            max_text_len=6,
        ),
        timesteps=10,
        sample_timesteps=3,
    )
    p = DiffusionPrior(cfg)
    params = p.init_params(jax.random.PRNGKey(0))
    ve = jax.random.normal(jax.random.PRNGKey(1), (2, D))
    te = jax.random.normal(jax.random.PRNGKey(2), (2, D))
    enc = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 12))
    loss = p.loss(params, jax.random.PRNGKey(4), ve, te, text_encodings=enc)
    assert np.isfinite(float(loss))
    out = p.sample(params, jax.random.PRNGKey(5), te, text_encodings=enc)
    assert out.shape == (2, D)


def test_dalle2video_end_to_end(prior):
    from dalle2_video_tpu.engine.dalle2video import DALLE2Video
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig

    p, prior_params = prior
    u = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=D,
        init_cross_embed=False, init_conv_ksize=3,
    )
    dec = VideoDecoder(
        VideoDecoderConfig(
            unets=(u,), frame_sizes=(8,), frame_numbers=(2,),
            timesteps=10, learned_variance=False,
        )
    )
    dec_params = dec.init_params(jax.random.PRNGKey(0))
    wrapper = DALLE2Video(p, dec)
    te = jax.random.normal(jax.random.PRNGKey(1), (2, D))
    vid = wrapper.generate(
        prior_params, dec_params, jax.random.PRNGKey(2), te, cond_scale=1.5
    )
    assert vid.shape == (2, 2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(vid)))


def test_rotary_embed_properties():
    """Rotation preserves norms and gives relative-position-dependent dots
    (models/layers.rotary_embed; dalle2-pytorch rotary_emb parity)."""
    import numpy as np

    from dalle2_video_tpu.models.layers import rotary_embed

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 16))
    r = rotary_embed(x)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(r), axis=-1),
        np.linalg.norm(np.asarray(x), axis=-1), rtol=1e-5,
    )
    # dot of rotated(q_i), rotated(k_j) depends only on (i - j): shift both
    q = jax.random.normal(jax.random.PRNGKey(1), (1, 16))
    k = jax.random.normal(jax.random.PRNGKey(2), (1, 16))
    def dot_at(i, j, n=12):
        qs = jnp.zeros((n, 16)).at[i].set(q[0])
        ks = jnp.zeros((n, 16)).at[j].set(k[0])
        return float(jnp.sum(rotary_embed(qs)[i] * rotary_embed(ks)[j]))
    np.testing.assert_allclose(dot_at(2, 5), dot_at(4, 7), rtol=1e-5)


def test_rotary_embed_partial_interleaved():
    """dalle2-pytorch parity details (ADVICE r2): only the first
    min(32, dim_head) dims rotate; rotation is interleaved (x[2i], x[2i+1])
    pairs — position-0 rows are unchanged, dims >= 32 always pass through."""
    import numpy as np

    from dalle2_video_tpu.models.layers import rotary_embed

    x = jax.random.normal(jax.random.PRNGKey(0), (3, 6, 64))
    r = rotary_embed(x)
    # dims beyond rot_dim=32 are never rotated
    np.testing.assert_allclose(
        np.asarray(r[..., 32:]), np.asarray(x[..., 32:]), atol=0)
    # position 0 has angle 0 everywhere -> identity on the rotated slice
    np.testing.assert_allclose(
        np.asarray(r[:, 0]), np.asarray(x[:, 0]), atol=1e-6)
    # interleaved convention: at position n, pair (0,1) rotates by angle n
    # (inv_freq[0] = 1), so r[...,0] = x0*cos(n) - x1*sin(n)
    n = 3
    expected = x[:, n, 0] * jnp.cos(float(n)) - x[:, n, 1] * jnp.sin(float(n))
    np.testing.assert_allclose(
        np.asarray(r[:, n, 0]), np.asarray(expected), rtol=1e-5)


def test_rel_pos_bias_causal_buckets():
    """Bias depends only on (query - key) distance; shape (heads, n, n)."""
    import numpy as np

    from dalle2_video_tpu.models.prior import RelPosBias

    mod = RelPosBias(heads=4)
    params = mod.init(jax.random.PRNGKey(0), 8)
    b = mod.apply(params, 8)
    assert b.shape == (4, 8, 8)
    bn = np.asarray(b)
    # same relative distance -> same bias
    np.testing.assert_allclose(bn[:, 3, 1], bn[:, 5, 3])
    # the causal region (k <= q) must distinguish near from far
    assert not np.allclose(bn[:, 7, 6], bn[:, 7, 0])


def test_prior_faithful_transformer_trains():
    """rotary + rel-pos-bias + swiglu prior (ROADMAP #8 defaults): loss
    finite and decreasing on a tiny overfit task."""
    import numpy as np
    import optax

    from dalle2_video_tpu.models.prior import (
        DiffusionPrior,
        DiffusionPriorConfig,
        PriorNetworkConfig,
    )

    prior = DiffusionPrior(DiffusionPriorConfig(
        network=PriorNetworkConfig(dim=32, depth=2, heads=2, dim_head=8),
        timesteps=32,
    ))
    params = prior.init_params(jax.random.PRNGKey(0))
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    te = jax.random.normal(jax.random.PRNGKey(1), (4, 32))
    ve = jax.random.normal(jax.random.PRNGKey(2), (4, 32))

    @jax.jit
    def step(p, o, key):
        loss, g = jax.value_and_grad(lambda pp: prior.loss(pp, key, ve, te))(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, loss

    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(40):
        key, k = jax.random.split(key)
        p_or = params
        params, opt, loss = step(params, opt, k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_prior_sample_per_row_key_invariance(prior):
    """Per-row keys (utils/keys.py): each row's best-of-N result depends
    only on its own key (candidate j draws from fold_in(key_i, j))."""
    from dalle2_video_tpu.utils import keys as keyutil

    p, params = prior
    te = jax.random.normal(jax.random.PRNGKey(2), (3, D))
    rows = keyutil.batch_keys([4, 8, 15])

    full = p.sample(params, rows, te, num_samples_per_batch=2)
    assert np.isfinite(np.asarray(full)).all()

    solo = p.sample(
        params, keyutil.take(rows, 2, 1), te[2:3], num_samples_per_batch=2
    )
    np.testing.assert_allclose(
        np.asarray(solo[0]), np.asarray(full[2]), atol=1e-5
    )

    other = p.sample(
        params, keyutil.batch_keys([4, 99, 15]), te, num_samples_per_batch=2
    )
    np.testing.assert_allclose(np.asarray(other[0]), np.asarray(full[0]),
                               atol=1e-5)
    assert float(np.abs(np.asarray(other[1]) - np.asarray(full[1])).max()) > 1e-4


def test_dalle2video_generate_per_row_keys(prior):
    """Full text->video wrapper with per-row keys: a row's video depends
    only on its own key through BOTH the prior and the decoder."""
    from dalle2_video_tpu.engine.dalle2video import DALLE2Video
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.utils import keys as keyutil

    p, prior_params = prior
    u = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=D,
        init_cross_embed=False, init_conv_ksize=3,
    )
    dec = VideoDecoder(
        VideoDecoderConfig(
            unets=(u,), frame_sizes=(8,), frame_numbers=(2,),
            timesteps=10, learned_variance=False,
        )
    )
    dec_params = dec.init_params(jax.random.PRNGKey(0))
    wrapper = DALLE2Video(p, dec)
    te = jax.random.normal(jax.random.PRNGKey(1), (3, D))
    rows = keyutil.batch_keys([5, 6, 7])

    full = np.asarray(wrapper.generate(
        prior_params, dec_params, rows, te, cond_scale=1.5))
    solo = np.asarray(wrapper.generate(
        prior_params, dec_params, keyutil.take(rows, 2, 1), te[2:3],
        cond_scale=1.5))
    assert np.isfinite(full).all()
    np.testing.assert_allclose(solo[0], full[2], atol=1e-4)


def test_dalle2video_temporal_emb_mode(prior):
    """temporal_emb: (b, d, t) per-frame text embeds flatten through the
    prior (with per-frame best-of-N) and condition the decoder with one
    token PER FRAME EMBED (the reference's embed conditioning was inert —
    SURVEY §2e.1 — so its raw (b,d,t) passthrough never executed)."""
    from dalle2_video_tpu.engine.dalle2video import DALLE2Video
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig

    p, prior_params = prior
    u = UNet3DConfig(
        dim=8, dim_mults=(1, 2), attn_heads=2, attn_dim_head=4,
        num_resnet_blocks=1, resnet_groups=4, video_embed_dim=D,
        init_cross_embed=False, init_conv_ksize=3,
    )
    dec = VideoDecoder(
        VideoDecoderConfig(
            unets=(u,), frame_sizes=(8,), frame_numbers=(2,),
            timesteps=10, learned_variance=False,
        )
    )
    dec_params = dec.init_params(jax.random.PRNGKey(0), per_frame_embeds=True)
    wrapper = DALLE2Video(p, dec, temporal_emb=True)
    te = jax.random.normal(jax.random.PRNGKey(1), (2, D, 3))  # (b, d, t)
    vid = wrapper.generate(
        prior_params, dec_params, jax.random.PRNGKey(2), te, cond_scale=1.5
    )
    assert vid.shape == (2, 2, 8, 8, 3)
    assert np.all(np.isfinite(np.asarray(vid)))
