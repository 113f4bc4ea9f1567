"""Shape/equivariance tests for the ops layer (SURVEY.md §4, item 2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.ops import (
    from_torch_layout,
    gaussian_blur_video,
    normalize_neg_one_to_one,
    pixel_shuffle_spatial,
    pixel_unshuffle_spatial,
    resize_video,
    resize_video_time,
    to_torch_layout,
    unnormalize_zero_to_one,
)


def test_layout_roundtrip():
    x = jnp.arange(2 * 3 * 4 * 5 * 6, dtype=jnp.float32).reshape(2, 3, 4, 5, 6)
    np.testing.assert_array_equal(to_torch_layout(from_torch_layout(x)), x)


def test_normalize_roundtrip():
    x = jnp.linspace(0, 1, 10)
    np.testing.assert_allclose(
        unnormalize_zero_to_one(normalize_neg_one_to_one(x)), x, atol=1e-7
    )


def test_pixel_shuffle_inverts_unshuffle():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8, 4))
    down = pixel_unshuffle_spatial(x, 2)
    assert down.shape == (2, 3, 4, 4, 16)
    # unshuffle uses (s1, s2, c) order; shuffle expects (c, s1, s2) — compose
    # the channel permutation explicitly for the roundtrip
    b, t, h, w, cf = down.shape
    perm = down.reshape(b, t, h, w, 2, 2, 4).transpose(0, 1, 2, 3, 6, 4, 5)
    up = pixel_shuffle_spatial(perm.reshape(b, t, h, w, cf), 2)
    np.testing.assert_allclose(np.asarray(up), np.asarray(x), atol=1e-6)


def test_pixel_shuffle_subpixel_order():
    """With the (c, s1, s2) channel convention, identical subpixel channels
    must produce a constant 2x2 block — the ICNR no-checkerboard property."""
    c = 3
    x = jnp.arange(c, dtype=jnp.float32)
    x = jnp.repeat(x, 4)[None, None, None, None, :]  # (1,1,1,1,12): c-major
    up = pixel_shuffle_spatial(x, 2)
    assert up.shape == (1, 1, 2, 2, c)
    for ch in range(c):
        np.testing.assert_array_equal(np.asarray(up[0, 0, :, :, ch]), ch)


def test_resize_video_preserves_time():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 16, 16, 3))
    y = resize_video(x, 8, method="nearest")
    assert y.shape == (2, 5, 8, 8, 3)
    z = resize_video(x, 32, method="bilinear")
    assert z.shape == (2, 5, 32, 32, 3)
    # time axis untouched: constant-in-time input stays constant-in-time
    xc = jnp.broadcast_to(x[:, :1], x.shape)
    yc = resize_video(xc, 8)
    np.testing.assert_allclose(np.asarray(yc[:, 0]), np.asarray(yc[:, 3]), atol=1e-6)


def test_resize_clamp():
    x = jnp.full((1, 1, 4, 4, 1), 5.0)
    y = resize_video(x, 2, clamp_range=(0.0, 1.0))
    np.testing.assert_allclose(np.asarray(y), 1.0)


def test_resize_video_time():
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 8, 8, 3))
    y = resize_video_time(x, 8)
    assert y.shape == (1, 8, 8, 8, 3)


def test_gaussian_blur_preserves_mean_and_shape():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 16, 16, 3)) + 2.0
    y = gaussian_blur_video(x, kernel_size=3, sigma=0.6)
    assert y.shape == x.shape
    # blur is an averaging filter with reflect pad: mean approx preserved
    assert float(jnp.abs(y.mean() - x.mean())) < 1e-2
    # and variance strictly reduced
    assert float(y.std()) < float(x.std())


def test_gaussian_blur_constant_invariant():
    x = jnp.full((1, 2, 8, 8, 3), 0.7)
    y = gaussian_blur_video(x, 5, 1.0)
    np.testing.assert_allclose(np.asarray(y), 0.7, atol=1e-6)


def test_gaussian_blur_matches_direct_convolution():
    """Separable blur == dense 2D gaussian convolution."""
    k, s = 3, 0.6
    x1d = np.arange(k) - (k - 1) / 2
    g = np.exp(-(x1d**2) / (2 * s * s))
    g = g / g.sum()
    k2d = np.outer(g, g)
    rng = np.random.RandomState(0)
    img = rng.randn(6, 6).astype(np.float32)
    pad = np.pad(img, 1, mode="reflect")
    expected = np.zeros_like(img)
    for i in range(6):
        for j in range(6):
            expected[i, j] = (pad[i : i + 3, j : j + 3] * k2d).sum()
    x = jnp.asarray(img)[None, None, :, :, None]
    got = np.asarray(gaussian_blur_video(x, k, s))[0, 0, :, :, 0]
    np.testing.assert_allclose(got, expected, atol=1e-5)


def test_paired_random_crop_per_sample_shared_pair():
    """Each batch element draws its OWN crop offsets, and the lowres pair
    gets the SAME offsets (kornia same-params semantics, reference
    dalle2_video.py:2260-2265)."""
    import jax

    from dalle2_video_tpu.ops.video import paired_random_crop

    b, t, h, w, c = 8, 2, 16, 16, 1
    # video encodes its own (row, col) coordinates so the applied offset is
    # recoverable from the crop content
    rows = jnp.broadcast_to(jnp.arange(h)[None, None, :, None, None], (b, t, h, w, c))
    cols = jnp.broadcast_to(jnp.arange(w)[None, None, None, :, None], (b, t, h, w, c))
    video = rows * 100.0 + cols
    crop = 4
    vc, lc = paired_random_crop(jax.random.PRNGKey(0), video, crop, video * 2.0)
    assert vc.shape == (b, t, crop, crop, c)
    # recover per-sample offsets from the top-left pixel
    tl = np.asarray(vc[:, 0, 0, 0, 0])
    offs = [(int(v // 100), int(v % 100)) for v in tl]
    assert len(set(offs)) > 1, "offsets must differ across the batch"
    # pair got the same offsets
    np.testing.assert_allclose(np.asarray(lc), np.asarray(vc) * 2.0)
    # crops are valid windows (contiguous coordinate blocks)
    for bi in range(b):
        oh, ow = offs[bi]
        expect = (rows[bi, :, oh : oh + crop, ow : ow + crop]
                  * 100.0 + cols[bi, :, oh : oh + crop, ow : ow + crop])
        np.testing.assert_allclose(np.asarray(vc[bi]), np.asarray(expect))
