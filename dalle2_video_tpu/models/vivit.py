"""ViViT — factorized space/time video-CLIP tower.

Rebuild of reference ``dalle2_video/video_encoder.py`` (modified from
rishikksh20/ViViT-pytorch): patch embedding, learned (frame, patch) position
embedding, per-frame space transformer, temporal transformer, a channel-
folding temporal-conv head, and flatten+LayerNorm+Linear to the embed dim.

Faithful quirks (video_encoder.py):
  * pos_embedding has num_patches+1 slots but no CLS token is appended;
    only the first ``n`` slots are used (:127-129, :158)
  * the per-frame representation after the space transformer is the
    transformed PATCH-0 token, not a pooled/CLS token (:163-164)
  * the temporal-conv head folds time by ``scale_dim_conv`` into channels
    twice, so num_frames must be divisible by scale_dim_conv**2 (:137-144)

TPU-first: frames fold into the batch for the space transformer (one big
attention batch), all matmuls batched; attention is standard MHA (the
reference tower uses full per-head kv, unlike the decoder's MQA).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from dalle2_video_tpu.models.layers import torch_kernel_init


class MHAttention(nn.Module):
    """Standard pre-norm-free MHA (reference Attention, video_encoder.py:37-70)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        inner = h * d
        project_out = not (h == 1 and d == self.dim)

        qkv = nn.Dense(inner * 3, use_bias=False, kernel_init=torch_kernel_init, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        rs = lambda a: a.reshape(b, n, h, d)
        q, k, v = rs(q), rs(k), rs(v)
        attn = jax.nn.softmax(
            jnp.einsum("bnhd,bmhd->bhnm", q * (d**-0.5), k), axis=-1
        )
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        if project_out:
            out = nn.Dense(self.dim, kernel_init=torch_kernel_init, name="to_out")(out)
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.Dense(self.hidden_dim, kernel_init=torch_kernel_init)(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, kernel_init=torch_kernel_init)(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class Transformer(nn.Module):
    """Pre-norm transformer (reference Transformer, video_encoder.py:73-95)."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        for i in range(self.depth):
            y = nn.LayerNorm(name=f"attn_norm{i}")(x)
            x = x + MHAttention(
                self.dim, self.heads, self.dim_head, self.dropout, name=f"attn{i}"
            )(y, deterministic)
            y = nn.LayerNorm(name=f"ff_norm{i}")(x)
            x = x + FeedForward(self.dim, self.mlp_dim, self.dropout, name=f"ff{i}")(
                y, deterministic
            )
        return x


@dataclasses.dataclass(frozen=True)
class ViViTConfig:
    frame_size: int = 224
    patch_size: int = 56
    num_frames: int = 150
    dim: int = 512
    depth: int = 4
    heads: int = 3
    in_channels: int = 3
    dim_head: int = 64
    dropout: float = 0.0
    emb_dropout: float = 0.0
    scale_dim_attn: int = 4
    scale_dim_conv: int = 5

    def __post_init__(self):
        assert self.frame_size % self.patch_size == 0
        assert self.num_frames % (self.scale_dim_conv**2) == 0, (
            "temporal-conv head folds time by scale_dim_conv twice "
            f"({self.num_frames} % {self.scale_dim_conv**2} != 0)"
        )


class ViViT(nn.Module):
    """Input (b, t, h, w, c) -> video embedding (b, dim)."""

    cfg: ViViTConfig

    @nn.compact
    def __call__(self, video: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        b, t, hh, ww, c = video.shape
        p = cfg.patch_size
        nh, nw = hh // p, ww // p
        n = nh * nw

        # patch embedding: "b t (h p1) (w p2) c -> b t (h w) (p1 p2 c)"
        x = video.reshape(b, t, nh, p, nw, p, c)
        x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6)).reshape(b, t, n, p * p * c)
        x = nn.Dense(cfg.dim, kernel_init=torch_kernel_init, name="patch_embed")(x)

        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),
            (1, cfg.num_frames, (cfg.frame_size // p) ** 2 + 1, cfg.dim),
        )
        x = x + pos[:, :t, :n]
        x = nn.Dropout(cfg.emb_dropout)(x, deterministic=deterministic)

        # space transformer per frame (frames folded into batch)
        x = x.reshape(b * t, n, cfg.dim)
        x = Transformer(
            cfg.dim, cfg.depth, cfg.heads, cfg.dim_head,
            cfg.dim * cfg.scale_dim_attn, cfg.dropout, name="space_transformer",
        )(x, deterministic)
        # frame representation = transformed patch-0 token (reference :163-164)
        x = x[:, 0].reshape(b, t, cfg.dim)

        x = Transformer(
            cfg.dim, cfg.depth, cfg.heads, cfg.dim_head,
            cfg.dim * cfg.scale_dim_attn, cfg.dropout, name="temporal_transformer",
        )(x, deterministic)

        # temporal conv head (reference :137-144): fold time into channels
        # twice with Conv1d(k=3) in between; layout here is (b, t, d)
        s = cfg.scale_dim_conv
        d = cfg.dim
        # "b d (t s) -> b (d s) t"  on (b, d, t): groups time by s
        h = x.reshape(b, t // s, s, d).reshape(b, t // s, s * d)
        h = nn.Conv(
            d, (3,), padding="SAME", kernel_init=torch_kernel_init, name="temporal_conv1"
        )(h)
        h = h.reshape(b, t // s // s, s, d).reshape(b, t // (s * s), s * d)
        h = nn.Conv(
            d, (3,), padding="SAME", kernel_init=torch_kernel_init, name="temporal_conv2"
        )(h)
        h = nn.silu(h)

        h = h.reshape(b, -1)  # (b, dim * num_frames / s^2)
        h = nn.LayerNorm(name="out_norm")(h)
        return nn.Dense(cfg.dim, kernel_init=torch_kernel_init, name="to_out")(h)
