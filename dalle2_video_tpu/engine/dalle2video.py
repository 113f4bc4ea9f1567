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
        # jit_parts=True: compiled prior sampler per (cond_scale,) — the
        # decoder side caches per stage (VideoDecoder._jitted_sample_stage)
        self._prior_jit_cache: Dict[float, Any] = {}

    def generate(
        self,
        prior_params: Any,
        decoder_params: Dict[str, Any],
        rng: jax.Array,
        text_embed: jnp.ndarray,
        text_encodings: Optional[jnp.ndarray] = None,
        cond_scale: float = 1.0,
        prior_cond_scale: float = 1.0,
        negative_text_embed: Optional[jnp.ndarray] = None,
        jit_parts: bool = False,
        **sample_kwargs,
    ) -> jnp.ndarray:
        """text_embed (b, d) — or (b, d, t) in temporal_emb mode — -> video.

        `rng` may be a single key or per-row keys (utils/keys.py, not
        supported in temporal_emb mode where the prior batch is b*t).
        Extra kwargs (max_batch_size, inpaint_video/inpaint_mask/... for
        conditional generation) pass through to decoder.sample.

        jit_parts=True compiles the prior sampler and each decoder stage
        as SEPARATE cached programs instead of expecting the caller to
        jit this whole method — required on backends that cap compiled-
        program size (axon remote compile rejects the fused graph), and
        programs are shared across calls/entry points.

        negative_text_embed (negative prompting, beyond-reference): runs
        the prior on the negative text embed too and uses the resulting
        video embed as the decoder's CFG baseline (decoder.sample
        negative_video_embed) — needs cond_scale != 1."""
        k_prior, k_dec = self._split_rng(rng, negative_text_embed)
        video_embed, negative_video_embed = self._prior_embeds(
            prior_params, k_prior, text_embed, text_encodings,
            prior_cond_scale, negative_text_embed, jit_parts,
        )
        if negative_video_embed is not None:
            sample_kwargs["negative_video_embed"] = negative_video_embed

        text_enc = text_encodings if self.decoder_need_text_cond else None
        return self.decoder.sample(
            decoder_params, k_dec,
            video_embed=video_embed,
            text_encodings=text_enc,
            cond_scale=cond_scale,
            jit_stages=jit_parts,
            **sample_kwargs,
        )

    def _split_rng(self, rng, negative_text_embed):
        from dalle2_video_tpu.utils import keys as keyutil

        if self.temporal_emb and keyutil.is_batched(rng):
            raise ValueError("per-row keys are not supported with temporal_emb")
        if self.temporal_emb and negative_text_embed is not None:
            raise ValueError("negative prompting unsupported with temporal_emb")
        return keyutil.split(rng)

    def _prior_embeds(
        self,
        prior_params: Any,
        k_prior: jax.Array,
        text_embed: jnp.ndarray,
        text_encodings: Optional[jnp.ndarray],
        prior_cond_scale: float,
        negative_text_embed: Optional[jnp.ndarray],
        jit_parts: bool,
    ):
        """prior.sample on the text embed(s) -> (video_embed,
        negative_video_embed-or-None). Shared by generate/generate_long."""
        from dalle2_video_tpu.utils import keys as keyutil

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

        if jit_parts:
            scale = float(prior_cond_scale)
            prior_sample = self._prior_jit_cache.get(scale)
            if prior_sample is None:
                def _prior_sample(params_, key_, flat_, enc_):
                    return self.prior.sample(
                        params_, key_, flat_, text_encodings=enc_,
                        num_samples_per_batch=self.prior_num_samples,
                        cond_scale=scale,
                    )

                prior_sample = jax.jit(_prior_sample)
                self._prior_jit_cache[scale] = prior_sample
        else:
            prior_sample = lambda params_, key_, flat_, enc_: self.prior.sample(
                params_, key_, flat_, text_encodings=enc_,
                num_samples_per_batch=self.prior_num_samples,
                cond_scale=prior_cond_scale,
            )

        video_embed = prior_sample(
            prior_params, k_prior, flat,
            prior_enc if prior_needs_enc else None,
        )

        if self.temporal_emb:
            # per-frame embeds -> (b, t, d): UNet3D consumes one
            # conditioning token PER FRAME EMBED (cross-attention over t
            # tokens; the add-to-time path uses their mean) — information-
            # preserving, beyond the reference whose embed conditioning is
            # silently inert (its quirk #1, SURVEY §2e.1).
            video_embed = video_embed.reshape(b, t, d)

        negative_video_embed = None
        if negative_text_embed is not None:
            # an independent key: the negative stream must not perturb the
            # positive stream's draws. Broadcast a shared (1, d) negative to
            # the batch so per-row keys stay aligned with prior rows.
            k_neg = keyutil.fold_in(k_prior, 1)
            negative_video_embed = prior_sample(
                prior_params, k_neg,
                jnp.broadcast_to(negative_text_embed, flat.shape),
                None,
            )
        return video_embed, negative_video_embed

    def generate_long(
        self,
        prior_params: Any,
        decoder_params: Dict[str, Any],
        rng: jax.Array,
        text_embed: jnp.ndarray,
        *,
        n_frames: int,
        overlap: Optional[int] = None,
        text_encodings: Optional[jnp.ndarray] = None,
        cond_scale: float = 1.0,
        prior_cond_scale: float = 1.0,
        negative_text_embed: Optional[jnp.ndarray] = None,
        jit_parts: bool = False,
        **long_kwargs,
    ) -> jnp.ndarray:
        """text -> video of ARBITRARY length (beyond-reference; the
        reference samples only the fixed training length,
        dalle2_video.py:2053-2186): one prior pass, then autoregressive
        sliding-window decoding (engine/longvideo.py). Extra kwargs
        (inpaint_method, max_batch_size, stop_at_unet_number, ...) pass to
        generate_long_video. Not supported with temporal_emb (the per-frame
        embed grid is tied to the training window)."""
        from dalle2_video_tpu.engine.longvideo import generate_long_video

        if self.temporal_emb:
            raise ValueError("generate_long is unsupported with temporal_emb")
        k_prior, k_dec = self._split_rng(rng, negative_text_embed)
        video_embed, negative_video_embed = self._prior_embeds(
            prior_params, k_prior, text_embed, text_encodings,
            prior_cond_scale, negative_text_embed, jit_parts,
        )
        text_enc = text_encodings if self.decoder_need_text_cond else None
        return generate_long_video(
            self.decoder, decoder_params, k_dec,
            n_frames=n_frames,
            overlap=overlap,
            video_embed=video_embed,
            text_encodings=text_enc,
            cond_scale=cond_scale,
            negative_video_embed=negative_video_embed,
            jit_stages=jit_parts,
            **long_kwargs,
        )
