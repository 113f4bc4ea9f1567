"""Alternative-backend CLIP adapters (VERDICT r3 missing #2): the
BaseClipAdapter contract, x-clip / CoCa facades, and the decoder-side
auto-wrap (reference dalle2_video.py:1248-1256). The x_clip / coca_pytorch
packages are absent (as in the reference's own broken env), so the facades
are driven by tiny torch stand-ins exposing the same attribute surface."""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn

from dalle2_video_tpu.models.clip_adapter import (
    CoCaAdapter,
    GenericClipAdapter,
    XClipAdapter,
    wrap_clip,
)

B, T, S, D, L = 2, 3, 8, 16, 12


class XClipStandin(nn.Module):
    """x-clip CLIP surface: text_transformer / visual_transformer emit
    (b, 1+n, D) with a CLS slot; to_*_latent project CLS -> dim_latent."""

    def __init__(self):
        super().__init__()
        self.dim_latent = L
        self.text_emb = nn.Embedding(100, D)
        self.to_text_latent = nn.Linear(D, L, bias=False)
        self.vis_proj = nn.Linear(3 * S * S, D, bias=False)
        self.to_visual_latent = nn.Linear(D, L, bias=False)

    def text_transformer(self, tokens):
        e = self.text_emb(tokens)  # (b, n, D)
        cls = e.mean(dim=1, keepdim=True)
        return torch.cat([cls, e], dim=1)

    def visual_transformer(self, frames):  # (b, 3, S, S)
        flat = frames.reshape(frames.shape[0], -1)
        e = self.vis_proj(flat)[:, None, :]
        return torch.cat([e, e], dim=1)  # CLS + one token


class CoCaStandin(nn.Module):
    def __init__(self):
        super().__init__()
        self.dim = L
        self.text_head = nn.Embedding(100, L)
        self.img_head = nn.Linear(3 * S * S, L, bias=False)

    def embed_text(self, tokens):
        emb = self.text_head(tokens).mean(dim=1)
        return emb, self.text_head(tokens)

    def embed_image(self, frames):
        return self.img_head(frames.reshape(frames.shape[0], -1))


def _check_adapter(ad):
    tokens = np.arange(B * 5).reshape(B, 5) % 100
    videos = np.random.RandomState(0).rand(B, T, S, S, 3).astype(np.float32)

    emb, enc = ad.embed_text(tokens)
    assert emb.shape == (B, L)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(emb), axis=-1), 1.0, atol=1e-5
    )
    vemb, venc = ad.embed_video(videos)
    assert vemb.shape == (B, L) and venc is None
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(vemb), axis=-1), 1.0, atol=1e-5
    )
    assert ad.dim_latent == L


def test_xclip_adapter():
    ad = wrap_clip(XClipStandin())
    assert isinstance(ad, XClipAdapter)
    _check_adapter(ad)
    # encodings are the non-CLS tokens
    emb, enc = ad.embed_text(np.zeros((B, 5), np.int64))
    assert enc.shape == (B, 5, D)


def test_coca_adapter():
    ad = wrap_clip(CoCaStandin())
    assert isinstance(ad, CoCaAdapter)
    _check_adapter(ad)


def test_generic_adapter_and_wrap_rejects():
    import jax.numpy as jnp

    ad = GenericClipAdapter(
        text_fn=lambda tok: jnp.ones((tok.shape[0], L)),
        video_fn=lambda vid: jnp.ones((vid.shape[0], L)),
        latent_dim=L,
    )
    _check_adapter(ad)
    with pytest.raises(TypeError, match="cannot adapt"):
        wrap_clip(object())


def test_adapter_freezes_gradients():
    """torch towers must not receive gradients through the adapter
    (reference freeze_model_and_make_eval_)."""
    m = XClipStandin()
    ad = XClipAdapter(m)
    assert all(not p.requires_grad for p in m.parameters())
