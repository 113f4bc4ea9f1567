"""Video-CLIP stack tests: ViViT shapes/quirks, CLIP loss + sharded parity,
retrieval metrics, text tower."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from dalle2_video_tpu.models.vivit import ViViT, ViViTConfig
from dalle2_video_tpu.utils.contrastive import (
    clip_loss,
    retrieval_metrics,
    sharded_clip_loss,
)


def test_vivit_output_shape():
    cfg = ViViTConfig(
        frame_size=16, patch_size=8, num_frames=25, dim=32, depth=1, heads=2,
        dim_head=8, scale_dim_conv=5,
    )
    model = ViViT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 25, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out.shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(out)))


def test_vivit_frame_divisibility_assert():
    with pytest.raises(AssertionError):
        ViViTConfig(frame_size=16, patch_size=8, num_frames=24, scale_dim_conv=5)


def test_vivit_time_sensitivity():
    """Temporal transformer must make the embedding order-sensitive."""
    cfg = ViViTConfig(
        frame_size=16, patch_size=8, num_frames=25, dim=32, depth=1, heads=2,
        dim_head=8,
    )
    model = ViViT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 25, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(1), x)
    out1 = model.apply(params, x)
    out2 = model.apply(params, x[:, ::-1])
    assert float(jnp.abs(out1 - out2).max()) > 1e-4


def test_clip_loss_matches_manual():
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (6, 8))
    # aligned pairs: loss with y=x should be much smaller than mismatched
    temp = jnp.asarray(2.0)
    aligned = float(clip_loss(x, x, temp))
    mismatched = float(clip_loss(x, jnp.roll(x, 1, axis=0), temp))
    assert aligned < 0.1 < mismatched


def test_clip_loss_symmetric():
    kx, ky = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(kx, (5, 12))
    y = jax.random.normal(ky, (5, 12))
    temp = jnp.asarray(1.0)
    np.testing.assert_allclose(
        float(clip_loss(x, y, temp)), float(clip_loss(y, x, temp)), rtol=1e-6
    )


def test_clip_loss_gradient_flows_to_temperature():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8))
    y = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    g = jax.grad(lambda t: clip_loss(x, y, t))(jnp.asarray(5.0))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_sharded_clip_loss_matches_single_device(mesh8):
    """Global-batch loss under shard_map == unsharded reference."""
    kx, ky = jax.random.split(jax.random.PRNGKey(2))
    b = 16  # 4 per data shard (mesh8 = 4x2)
    x = jax.random.normal(kx, (b, 32))
    y = x + jax.random.normal(ky, (b, 32))  # O(1) loss, not ~0
    temp = jnp.asarray(1.5)
    expected = float(clip_loss(x, y, temp))
    got = float(jax.jit(lambda a, bb: sharded_clip_loss(a, bb, temp, mesh8))(x, y))
    assert got == pytest.approx(expected, rel=1e-5)


def test_retrieval_metrics_perfect_and_random():
    x = jnp.eye(12, 16)
    m = retrieval_metrics(x, x)
    assert float(m["top1"]) == 1.0
    assert float(m["top10"]) == 1.0
    # orthogonal mismatch: diagonal not retrieved first
    y = jnp.roll(x, 1, axis=0)
    m2 = retrieval_metrics(x, y)
    assert float(m2["top1"]) == 0.0


def test_clip_text_encoder_shapes():
    cfg = CLIPTextConfig(vocab_size=100, context_length=12, width=16, heads=2,
                         layers=2, embed_dim=24)
    enc = CLIPTextEncoder(cfg)
    toks = jnp.array([[1, 5, 7, 99, 0, 0, 0, 0, 0, 0, 0, 0],
                      [1, 8, 99, 0, 0, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), toks)
    emb, encodings = enc.apply(params, toks, return_encodings=True)
    assert emb.shape == (2, 24)
    assert encodings.shape == (2, 12, 16)


def test_clip_text_encoder_causal():
    """Changing a token AFTER the EOT/pool position must not change the
    pooled embedding (causal masking)."""
    cfg = CLIPTextConfig(vocab_size=100, context_length=8, width=16, heads=2,
                         layers=1, embed_dim=16)
    enc = CLIPTextEncoder(cfg)
    toks1 = jnp.array([[1, 5, 99, 2, 0, 0, 0, 0]], jnp.int32)
    toks2 = jnp.array([[1, 5, 99, 7, 0, 0, 0, 0]], jnp.int32)
    params = enc.init(jax.random.PRNGKey(0), toks1)
    e1 = enc.apply(params, toks1)
    e2 = enc.apply(params, toks2)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-6)


def test_clip_adapter_facade():
    from dalle2_video_tpu.models.clip_adapter import VideoClipAdapter
    from dalle2_video_tpu.models.vivit import ViViT, ViViTConfig

    vcfg = ViViTConfig(frame_size=16, patch_size=8, num_frames=25, dim=24,
                       depth=1, heads=2, dim_head=8)
    tcfg = CLIPTextConfig(vocab_size=50, context_length=8, width=16, heads=2,
                          layers=1, embed_dim=24)
    videos = jax.random.normal(jax.random.PRNGKey(0), (2, 25, 16, 16, 3))
    tokens = jnp.array([[1, 5, 49, 0, 0, 0, 0, 0]] * 2, jnp.int32)
    vp = ViViT(vcfg).init(jax.random.PRNGKey(1), videos)
    tp = CLIPTextEncoder(tcfg).init(jax.random.PRNGKey(2), tokens)
    adapter = VideoClipAdapter.create(vcfg, vp, tp, tcfg)
    emb_t, enc = adapter.embed_text(tokens)
    emb_v, none = adapter.embed_video(videos)
    assert emb_t.shape == (2, 24) and enc.shape == (2, 8, 16)
    assert emb_v.shape == (2, 24) and none is None
    assert adapter.dim_latent == 24
    # frozen: no gradient flows through the adapter
    g = jax.grad(lambda v: adapter.embed_video(v)[0].sum())(videos)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_chunked_apply():
    from dalle2_video_tpu.utils.chunked import chunked_apply

    f = jax.jit(lambda x: x * 2.0)
    x = jnp.arange(10.0)[:, None]
    out = chunked_apply(f, 10, 4, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2)
    # kwargs + non-array args pass through
    g = jax.jit(lambda x, scale, y=None: x * scale + y)
    out2 = chunked_apply(g, 10, 3, x, 3.0, y=x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(x) * 4)


def test_openai_clip_text_import_equivalence(tmp_path):
    """load_openai_clip_text_params vs a real torch CLIP text tower.

    Builds a miniature torch module with EXACTLY OpenAI CLIP's text-tower
    structure and state-dict keys (token_embedding, positional_embedding,
    transformer.resblocks.{i}.attn.in_proj_*, mlp.c_fc/c_proj, ln_final,
    text_projection), runs both, and asserts outputs match — this is the
    test that fails on any transposed kernel in the converter
    (reference clip.load('ViT-B/32'), train_clip.py:82,133-135)."""
    torch = pytest.importorskip("torch")
    import collections

    from dalle2_video_tpu.models.clip_text import load_openai_clip_text_params

    VOCAB, CTX, D, H, LAYERS, EMB = 50, 8, 16, 2, 2, 12
    torch.manual_seed(0)

    class QuickGELU(torch.nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.attn = torch.nn.MultiheadAttention(D, H)
            self.ln_1 = torch.nn.LayerNorm(D)
            self.mlp = torch.nn.Sequential(
                collections.OrderedDict(
                    [
                        ("c_fc", torch.nn.Linear(D, 4 * D)),
                        ("gelu", QuickGELU()),
                        ("c_proj", torch.nn.Linear(4 * D, D)),
                    ]
                )
            )
            self.ln_2 = torch.nn.LayerNorm(D)

        def forward(self, x, mask):
            y = self.ln_1(x)
            y = self.attn(y, y, y, need_weights=False, attn_mask=mask)[0]
            x = x + y
            return x + self.mlp(self.ln_2(x))

    class Tower(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = torch.nn.Embedding(VOCAB, D)
            self.positional_embedding = torch.nn.Parameter(torch.randn(CTX, D) * 0.1)
            self.transformer = torch.nn.Module()
            self.transformer.resblocks = torch.nn.ModuleList(
                Block() for _ in range(LAYERS)
            )
            self.ln_final = torch.nn.LayerNorm(D)
            self.text_projection = torch.nn.Parameter(torch.randn(D, EMB) * D**-0.5)

        def forward(self, tokens):
            x = self.token_embedding(tokens) + self.positional_embedding
            mask = torch.full((CTX, CTX), float("-inf")).triu(1)
            x = x.permute(1, 0, 2)  # NLD -> LND (CLIP model.py)
            for blk in self.transformer.resblocks:
                x = blk(x, mask)
            x = x.permute(1, 0, 2)
            x = self.ln_final(x)
            pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
            return pooled @ self.text_projection, x

    tower = Tower().eval()
    # non-trivial weights everywhere (default MHA in_proj_bias is zeros)
    with torch.no_grad():
        for p in tower.parameters():
            p.add_(torch.randn_like(p) * 0.02)

    tokens = torch.randint(1, VOCAB, (3, CTX))
    with torch.no_grad():
        want_embed, want_enc = tower(tokens)

    path = str(tmp_path / "clip_text.pt")
    torch.save(tower.state_dict(), path)

    cfg = CLIPTextConfig(
        vocab_size=VOCAB, context_length=CTX, width=D, heads=H,
        layers=LAYERS, embed_dim=EMB,
    )
    variables = load_openai_clip_text_params(path, cfg)
    model = CLIPTextEncoder(cfg)
    got_embed, got_enc = model.apply(
        variables, jnp.asarray(tokens.numpy()), return_encodings=True
    )
    # f32 matmul-order noise is ~1e-5; a transposed kernel would be O(1)
    np.testing.assert_allclose(
        np.asarray(got_enc), want_enc.numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_embed), want_embed.numpy(), atol=1e-4, rtol=1e-4
    )


def test_vivit_dropout_applies_in_training():
    """Configured dropout must actually run during train_step (the
    reference's model.train() semantics): an rng is required, and
    different rngs give different losses."""
    import pytest

    from dalle2_video_tpu.models.clip_text import CLIPTextConfig
    from dalle2_video_tpu.models.vivit import ViViTConfig
    from dalle2_video_tpu.train.clip_trainer import ClipTrainer, ClipTrainerConfig

    vcfg = ViViTConfig(dim=32, num_frames=4, frame_size=16, patch_size=8,
                       depth=1, heads=2, dim_head=16, scale_dim_conv=2,
                       dropout=0.5, emb_dropout=0.5)
    tcfg = CLIPTextConfig(vocab_size=64, context_length=8, width=32, heads=2,
                          layers=1, embed_dim=32)
    tr = ClipTrainer(vcfg, tcfg, ClipTrainerConfig(lr=1e-3))
    videos = jax.random.uniform(jax.random.PRNGKey(0), (4, 4, 16, 16, 3))
    tokens = jax.random.randint(jax.random.PRNGKey(1), (4, 8), 0, 64)
    state = tr.init_state(jax.random.PRNGKey(2), videos[:1])
    text_params = tr.init_text_params(jax.random.PRNGKey(3))

    with pytest.raises(ValueError, match="dropout"):
        tr.train_step(state, text_params, videos, tokens)

    _, m1 = tr.train_step(state, text_params, videos, tokens,
                          jax.random.PRNGKey(10))
    _, m2 = tr.train_step(state, text_params, videos, tokens,
                          jax.random.PRNGKey(11))
    assert float(m1["loss"]) != float(m2["loss"])  # stochastic forward
