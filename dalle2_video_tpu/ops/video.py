"""Core video tensor ops, vectorized over the frame axis.

Native activation layout is channels-last ``(B, T, H, W, C)`` — feature dim on
TPU lanes. The reference's universal 2D->3D lifting device is a Python loop
over frames (``temporal_apply``, reference dalle2_video.py:81-96); here every
op is a single fused XLA computation over the whole video.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "normalize_neg_one_to_one",
    "unnormalize_zero_to_one",
    "resize_video",
    "resize_video_time",
    "gaussian_blur_video",
    "pixel_unshuffle_spatial",
    "pixel_shuffle_spatial",
    "from_torch_layout",
    "to_torch_layout",
]


def normalize_neg_one_to_one(x: jnp.ndarray) -> jnp.ndarray:
    """[0, 1] -> [-1, 1] (reference: dalle2-pytorch normalize_neg_one_to_one)."""
    return x * 2.0 - 1.0


def unnormalize_zero_to_one(x: jnp.ndarray) -> jnp.ndarray:
    """[-1, 1] -> [0, 1]."""
    return (x + 1.0) * 0.5


def from_torch_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, C, T, H, W) -> (B, T, H, W, C)."""
    return jnp.transpose(x, (0, 2, 3, 4, 1))


def to_torch_layout(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, C, T, H, W)."""
    return jnp.transpose(x, (0, 4, 1, 2, 3))


def resize_video(
    x: jnp.ndarray,
    size: int,
    method: str = "nearest",
    clamp_range: Optional[Tuple[float, float]] = None,
) -> jnp.ndarray:
    """Spatially resize every frame to (size, size), time preserved.

    Replaces reference ``temporal_apply(resize_image_to, ...)`` call sites
    (dalle2_video.py:2129-2136, 2257) with one XLA resize over (H, W).
    """
    b, t, h, w, c = x.shape
    if h == size and w == size and clamp_range is None:
        return x
    out = jax.image.resize(x, (b, t, size, size, c), method=method)
    if clamp_range is not None:
        out = jnp.clip(out, clamp_range[0], clamp_range[1])
    return out


def resize_video_time(
    x: jnp.ndarray, num_frames: int, method: str = "nearest"
) -> jnp.ndarray:
    """Resample the frame axis to ``num_frames`` (temporal SR conditioning).

    The reference never implemented temporal resampling (its frame_numbers
    ladder is inert — SURVEY.md §2e.6); this enables real temporal-SR cascades.
    """
    b, t, h, w, c = x.shape
    if t == num_frames:
        return x
    return jax.image.resize(x, (b, num_frames, h, w, c), method=method)


def _gaussian_kernel1d(kernel_size: int, sigma: float) -> jnp.ndarray:
    """Matches kornia.filters.get_gaussian_kernel1d (normalized, centered)."""
    x = jnp.arange(kernel_size, dtype=jnp.float32) - (kernel_size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2.0 * sigma**2))
    return g / g.sum()


def gaussian_blur_video(
    x: jnp.ndarray, kernel_size: int = 3, sigma: float = 0.6
) -> jnp.ndarray:
    """Per-frame spatial Gaussian blur with reflect padding.

    TPU-native equivalent of the per-frame kornia ``gaussian_blur2d`` loop
    (reference dalle2_video.py:1108, 1138-1144): separable depthwise convs
    along H then W, one conv over the whole (B*T) batch.
    """
    b, t, h, w, c = x.shape
    k = _gaussian_kernel1d(kernel_size, sigma).astype(x.dtype)
    pad = kernel_size // 2
    y = x.reshape(b * t, h, w, c)
    y = jnp.pad(y, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    # depthwise separable blur: H pass then W pass
    kh = jnp.tile(k.reshape(kernel_size, 1, 1, 1), (1, 1, 1, c))
    kw = jnp.tile(k.reshape(1, kernel_size, 1, 1), (1, 1, 1, c))
    dn = jax.lax.conv_dimension_numbers(y.shape, kh.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        y, kh, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), "VALID", dimension_numbers=dn, feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )
    return y.reshape(b, t, h, w, c)


def pixel_unshuffle_spatial(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B,T,H,W,C) -> (B,T,H/f,W/f,C*f*f). Space-to-depth, time preserved.

    Equivalent of the reference Downsample3D rearrange (dalle2_video.py:19-26).
    Channel order: (s1, s2, c) fastest-varying c.
    """
    b, t, h, w, c = x.shape
    f = factor
    x = x.reshape(b, t, h // f, f, w // f, f, c)
    x = jnp.transpose(x, (0, 1, 2, 4, 3, 5, 6))
    return x.reshape(b, t, h // f, w // f, f * f * c)


def pixel_shuffle_spatial(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """(B,T,H,W,C*f*f) -> (B,T,H*f,W*f,C). Depth-to-space, time preserved.

    Channel index is interpreted as (c, s1, s2) — i.e. the f*f subpixel
    replicas of one output channel are contiguous — so that the ICNR-style
    repeated init in PixelShuffleUpsample (models/layers.py) yields identical
    subpixels at init (kills checkerboard; reference dalle2_video.py:55-62).
    """
    b, t, h, w, cf = x.shape
    f = factor
    c = cf // (f * f)
    x = x.reshape(b, t, h, w, c, f, f)
    x = jnp.transpose(x, (0, 1, 2, 5, 3, 6, 4))
    return x.reshape(b, t, h * f, w * f, c)


def paired_random_crop(
    key: jax.Array,
    video: jnp.ndarray,
    crop: int,
    lowres: jnp.ndarray = None,
):
    """Per-SAMPLE random spatial crop, with the same offsets applied to the
    paired lowres-conditioning video (kornia RandomCrop same-params trick,
    reference dalle2_video.py:2260-2265: each batch element draws its own
    (oh, ow), reused on the pair). Layout (B, T, H, W, C)."""
    b, _, h, w, _ = video.shape
    kh, kw = jax.random.split(key)
    oh = jax.random.randint(kh, (b,), 0, h - crop + 1)
    ow = jax.random.randint(kw, (b,), 0, w - crop + 1)

    def take(v):
        return jax.vmap(
            lambda vi, ohi, owi: jax.lax.dynamic_slice(
                vi, (0, ohi, owi, 0), (vi.shape[0], crop, crop, vi.shape[3])
            )
        )(v, oh, ow)

    return take(video), (None if lowres is None else take(lowres))
