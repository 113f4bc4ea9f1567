"""CLIP adapter facade — uniform embed_text / embed_video interface.

Rebuild of the inherited adapter layer (BaseClipAdapter / XClipAdapter /
CoCaAdapter + freeze_model_and_make_eval_; reference usage
dalle2_video.py:9-10, 1248-1256, 2079, 2240 and trainer.py:309-320): one
frozen object the decoder/trainer can query for text and video embeddings
without knowing which towers are behind it.

JAX framing: "frozen" = params are captured constants + stop_gradient; no
mutable eval/train mode exists to toggle.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from dalle2_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from dalle2_video_tpu.models.vivit import ViViT, ViViTConfig


@dataclasses.dataclass(frozen=True)
class VideoClipAdapter:
    """Pairs the frozen text tower with a trained ViViT video tower.

    embed_text(tokens)  -> (embed (b, dim), encodings (b, 77, width))
    embed_video(videos) -> (embed (b, dim), None)
    Mirrors BaseClipAdapter's (embed, encodings) return contract.
    """

    text_encoder: CLIPTextEncoder
    text_params: Any
    vivit: ViViT
    vivit_params: Any

    @staticmethod
    def create(
        vivit_config: ViViTConfig,
        vivit_params: Any,
        text_params: Any,
        text_config: CLIPTextConfig = CLIPTextConfig(),
    ) -> "VideoClipAdapter":
        return VideoClipAdapter(
            text_encoder=CLIPTextEncoder(text_config),
            text_params=text_params,
            vivit=ViViT(vivit_config),
            vivit_params=vivit_params,
        )

    @property
    def dim_latent(self) -> int:
        return self.text_encoder.cfg.embed_dim

    def embed_text(self, tokens: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        embed, encodings = self.text_encoder.apply(
            self.text_params, tokens, return_encodings=True
        )
        return jax.lax.stop_gradient(embed), jax.lax.stop_gradient(encodings)

    def embed_video(self, videos: jnp.ndarray) -> Tuple[jnp.ndarray, None]:
        embed = self.vivit.apply(self.vivit_params, videos)
        return jax.lax.stop_gradient(embed), None
