"""Frozen CLIP text tower (ViT-B/32 text transformer) in JAX.

Replaces the reference's ``clip.load("ViT-B/32")`` frozen text encoder
(reference train_clip.py:82,133-135; eval_clip.py:58,70): 12-layer causal
transformer, width 512, 8 heads, 77-token context, quick-gelu, argmax-EOT
pooled embedding through a text projection.

Weights import from an OpenAI CLIP torch checkpoint via
``load_openai_clip_text_params`` when a state dict is available on disk;
otherwise random init (clearly NOT CLIP-compatible — for smoke/testing).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    heads: int = 8
    layers: int = 12
    embed_dim: int = 512  # output projection dim


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, causal_mask):
        y = nn.LayerNorm(name="ln_1")(x)
        b, n, d = y.shape
        h = self.heads
        hd = d // h
        qkv = nn.Dense(3 * d, name="attn_in")(y)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        rs = lambda a: a.reshape(b, n, h, hd)
        q, k, v = rs(q), rs(k), rs(v)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q * (hd**-0.5), k)
        sim = jnp.where(causal_mask[None, None], sim, jnp.finfo(sim.dtype).min)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, d)
        x = x + nn.Dense(d, name="attn_out")(out)
        y = nn.LayerNorm(name="ln_2")(x)
        y = nn.Dense(4 * d, name="mlp_fc")(y)
        y = quick_gelu(y)
        return x + nn.Dense(d, name="mlp_proj")(y)


class CLIPTextEncoder(nn.Module):
    cfg: CLIPTextConfig = CLIPTextConfig()

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, return_encodings: bool = False):
        """tokens (b, 77) int32 -> (embed (b, embed_dim), encodings (b, 77, width))."""
        cfg = self.cfg
        tok_emb = self.param(
            "token_embedding", nn.initializers.normal(0.02),
            (cfg.vocab_size, cfg.width),
        )
        pos_emb = self.param(
            "positional_embedding", nn.initializers.normal(0.01),
            (cfg.context_length, cfg.width),
        )
        n = tokens.shape[1]
        x = jnp.take(tok_emb, tokens, axis=0) + pos_emb[None, :n]
        mask = jnp.tril(jnp.ones((n, n), bool))
        for i in range(cfg.layers):
            x = ResidualAttentionBlock(cfg.width, cfg.heads, name=f"block{i}")(x, mask)
        x = nn.LayerNorm(name="ln_final")(x)
        proj = self.param(
            "text_projection", nn.initializers.normal(cfg.width**-0.5),
            (cfg.width, cfg.embed_dim),
        )
        # pooled embedding from the EOT position (argmax token id)
        eot = jnp.argmax(tokens, axis=-1)
        pooled = jnp.take_along_axis(x, eot[:, None, None], axis=1).squeeze(1)
        embed = pooled @ proj
        if return_encodings:
            return embed, x
        return embed


def load_openai_clip_text_params(path: str, cfg: CLIPTextConfig = CLIPTextConfig()) -> Dict[str, Any]:
    """Convert an OpenAI CLIP torch state dict (.pt) into this module's
    param pytree. Accepts the full model's state dict (jit archive or plain)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        sd = obj.state_dict()
    elif isinstance(obj, dict) and "state_dict" in obj:
        sd = obj["state_dict"]
    else:
        sd = obj
    g = lambda k: jnp.asarray(sd[k].float().numpy())

    params: Dict[str, Any] = {
        "token_embedding": g("token_embedding.weight"),
        "positional_embedding": g("positional_embedding"),
        "text_projection": g("text_projection"),
        "ln_final": {"scale": g("ln_final.weight"), "bias": g("ln_final.bias")},
    }
    for i in range(cfg.layers):
        p = f"transformer.resblocks.{i}"
        params[f"block{i}"] = {
            "ln_1": {"scale": g(f"{p}.ln_1.weight"), "bias": g(f"{p}.ln_1.bias")},
            "ln_2": {"scale": g(f"{p}.ln_2.weight"), "bias": g(f"{p}.ln_2.bias")},
            "attn_in": {
                "kernel": g(f"{p}.attn.in_proj_weight").T,
                "bias": g(f"{p}.attn.in_proj_bias"),
            },
            "attn_out": {
                "kernel": g(f"{p}.attn.out_proj.weight").T,
                "bias": g(f"{p}.attn.out_proj.bias"),
            },
            "mlp_fc": {
                "kernel": g(f"{p}.mlp.c_fc.weight").T,
                "bias": g(f"{p}.mlp.c_fc.bias"),
            },
            "mlp_proj": {
                "kernel": g(f"{p}.mlp.c_proj.weight").T,
                "bias": g(f"{p}.mlp.c_proj.bias"),
            },
        }
    return {"params": params}
