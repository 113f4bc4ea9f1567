"""Long-video generation: autoregressive sliding-window extension.

The reference can only sample clips of the fixed training length — its
``sample()`` is unconditional-from-noise at ``frame_numbers`` frames
(/root/reference/dalle2_video/dalle2_video.py:2053-2186) and nothing in it
can continue a clip. This module generates videos of ARBITRARY length from
the same fixed-length decoder by chaining the conditional-generation
(inpainting) path: each new window is sampled with its leading ``overlap``
frames clamped to the tail of what has already been generated (replacement
method — VDM §4 / RePaint eq. 8 — or reconstruction guidance), and the
non-overlapping frames are appended.

TPU shape discipline: every window after the first is the SAME traced
program (same shapes, same inpaint signature), so with
``jit_stages=True`` the whole arbitrarily-long generation reuses exactly
two cached compiled programs per cascade stage (first window: no-inpaint
trace; every later window: inpaint trace) — no recompiles as the video
grows, no dynamic shapes.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax.numpy as jnp

from dalle2_video_tpu.engine.decoder import VideoDecoder
from dalle2_video_tpu.utils import keys as keyutil


def generate_long_video(
    decoder: VideoDecoder,
    params: Dict[str, Any],
    rng,
    *,
    n_frames: int,
    overlap: Optional[int] = None,
    video_embed: Optional[jnp.ndarray] = None,
    text_encodings: Optional[jnp.ndarray] = None,
    batch_size: int = 1,
    cond_scale: float = 1.0,
    inpaint_method: str = "replace",
    inpaint_guidance_weight: float = 10.0,
    jit_stages: bool = False,
    max_batch_size: Optional[int] = None,
    negative_video_embed: Optional[jnp.ndarray] = None,
    negative_text_encodings: Optional[jnp.ndarray] = None,
    stop_at_unet_number: Optional[int] = None,
) -> jnp.ndarray:
    """Generate (b, n_frames, S, S, C) from a decoder trained on T-frame
    clips (T = the last sampled stage's frame_number), T <= n_frames.

    Window schedule: window 0 is a plain cascade sample; window j > 0 is a
    conditional sample whose first ``overlap`` frames are the previous
    tail, advancing the video by ``T - overlap`` frames per window. The
    known-region constraint is exact under ``replace`` (the stitched video
    never changes frames already emitted — each window only contributes
    its ``T - overlap`` new frames).

    overlap defaults to T // 4 (the video-extension setting scored in
    scripts/demo_inpaint.py). ``rng`` may be a single key or per-row keys
    (utils/keys.py); each window draws from an independent split so the
    full long video is a pure function of the input key(s).
    """
    cfg = decoder.config
    stage = (stop_at_unet_number or cfg.num_unets) - 1
    t_win = cfg.frame_numbers[stage]
    if overlap is None:
        overlap = max(1, t_win // 4)
    if not 0 < overlap < t_win:
        raise ValueError(f"overlap must be in (0, {t_win}), got {overlap}")
    if n_frames < t_win:
        raise ValueError(
            f"n_frames ({n_frames}) must be >= the decoder window ({t_win}); "
            f"use decoder.sample + resize_video_time for shorter clips"
        )
    stride = t_win - overlap
    n_windows = 1 + math.ceil(max(0, n_frames - t_win) / stride)

    if video_embed is not None:
        batch_size = video_embed.shape[0]
    keys = keyutil.split(rng, n_windows)

    common = dict(
        video_embed=video_embed,
        text_encodings=text_encodings,
        batch_size=batch_size,
        cond_scale=cond_scale,
        max_batch_size=max_batch_size,
        negative_video_embed=negative_video_embed,
        negative_text_encodings=negative_text_encodings,
        stop_at_unet_number=stop_at_unet_number,
        jit_stages=jit_stages,
    )

    video = decoder.sample(params, keys[0], **common)
    s = video.shape[2]
    # static per-window known-frame mask: leading `overlap` frames known
    mask = jnp.zeros((1, t_win, 1, 1, 1), jnp.float32).at[:, :overlap].set(1.0)
    pad = jnp.zeros((batch_size, stride, s, s, video.shape[-1]), video.dtype)

    for j in range(1, n_windows):
        known = jnp.concatenate([video[:, -overlap:], pad], axis=1)
        win = decoder.sample(
            params, keys[j],
            inpaint_video=known,
            inpaint_mask=mask,
            inpaint_method=inpaint_method,
            inpaint_guidance_weight=inpaint_guidance_weight,
            **common,
        )
        video = jnp.concatenate([video, win[:, overlap:]], axis=1)

    return video[:, :n_frames]
