"""DALLE2Video — end-to-end text -> video inference wrapper.

Rebuild of reference ``DALLE2Video`` (/root/reference/dalle2_video/
dalle2_video.py:2302-2370): prior.sample(text_embed) -> video_embed ->
decoder.sample(video_embed, ...), including the ``temporal_emb`` mode that
flattens a per-frame text-embed (b, d, t) through the prior and restores it.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from dalle2_video_tpu.engine.decoder import VideoDecoder
from dalle2_video_tpu.models.prior import DiffusionPrior


class DALLE2Video:
    def __init__(
        self,
        prior: DiffusionPrior,
        decoder: VideoDecoder,
        temporal_emb: bool = False,
        prior_num_samples: int = 2,
    ):
        self.prior = prior
        self.decoder = decoder
        self.temporal_emb = temporal_emb
        self.prior_num_samples = prior_num_samples
        self.decoder_need_text_cond = decoder.condition_on_text_encodings

    def generate(
        self,
        prior_params: Any,
        decoder_params: Dict[str, Any],
        rng: jax.Array,
        text_embed: jnp.ndarray,
        text_encodings: Optional[jnp.ndarray] = None,
        cond_scale: float = 1.0,
        prior_cond_scale: float = 1.0,
        **sample_kwargs,
    ) -> jnp.ndarray:
        """text_embed (b, d) — or (b, d, t) in temporal_emb mode — -> video.

        `rng` may be a single key or per-row keys (utils/keys.py, not
        supported in temporal_emb mode where the prior batch is b*t).
        Extra kwargs (max_batch_size, inpaint_video/inpaint_mask/... for
        conditional generation) pass through to decoder.sample."""
        from dalle2_video_tpu.utils import keys as keyutil

        if self.temporal_emb and keyutil.is_batched(rng):
            raise ValueError("per-row keys are not supported with temporal_emb")
        k_prior, k_dec = keyutil.split(rng)

        if self.temporal_emb:
            b, d, t = text_embed.shape
            flat = jnp.transpose(text_embed, (0, 2, 1)).reshape(b * t, d)
            prior_enc = (
                jnp.repeat(text_encodings, t, axis=0)
                if text_encodings is not None else None
            )
        else:
            flat = text_embed
            prior_enc = text_encodings

        # forward text encodings when the prior network conditions on them
        # (omitting the encoding tokens would change the transformer's
        # sequence length vs training — silent out-of-distribution sampling)
        prior_needs_enc = self.prior.config.network.cond_on_text_encodings
        video_embed = self.prior.sample(
            prior_params, k_prior, flat,
            text_encodings=prior_enc if prior_needs_enc else None,
            num_samples_per_batch=self.prior_num_samples,
            cond_scale=prior_cond_scale,
        )

        if self.temporal_emb:
            # per-frame embeds -> (b, t, d): UNet3D consumes one
            # conditioning token PER FRAME EMBED (cross-attention over t
            # tokens; the add-to-time path uses their mean) — information-
            # preserving, beyond the reference whose embed conditioning is
            # silently inert (its quirk #1, SURVEY §2e.1).
            video_embed = video_embed.reshape(b, t, d)

        text_enc = text_encodings if self.decoder_need_text_cond else None
        return self.decoder.sample(
            decoder_params, k_dec,
            video_embed=video_embed,
            text_encodings=text_enc,
            cond_scale=cond_scale,
            **sample_kwargs,
        )
