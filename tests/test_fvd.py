"""FVD harness tests (utils/fvd.py): closed-form Gaussian checks."""

import numpy as np

from dalle2_video_tpu.utils.fvd import (
    compute_fvd,
    feature_stats,
    frechet_distance,
    fvd_from_features,
)


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.randn(500, 16)
    mu, sig = feature_stats(f)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-8


def test_frechet_diagonal_closed_form():
    """Diagonal Gaussians: d^2 = |dmu|^2 + sum((sqrt(v1)-sqrt(v2))^2)."""
    d = 8
    mu1, mu2 = np.zeros(d), np.full(d, 0.5)
    v1 = np.linspace(0.5, 2.0, d)
    v2 = np.linspace(1.0, 3.0, d)
    want = float(((mu1 - mu2) ** 2).sum() + ((np.sqrt(v1) - np.sqrt(v2)) ** 2).sum())
    got = frechet_distance(mu1, np.diag(v1), mu2, np.diag(v2))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_fvd_from_features_separates_distributions():
    rng = np.random.RandomState(1)
    real = rng.randn(2000, 12)
    close = rng.randn(2000, 12) * 1.02
    far = rng.randn(2000, 12) * 1.5 + 2.0
    d_close = fvd_from_features(real, close)
    d_far = fvd_from_features(real, far)
    assert 0 <= d_close < 0.3
    assert d_far > 10 * max(d_close, 1e-6)


def test_compute_fvd_batched_matches_unbatched():
    rng = np.random.RandomState(2)
    vids_a = rng.rand(20, 2, 4, 4, 3).astype(np.float32)
    vids_b = rng.rand(20, 2, 4, 4, 3).astype(np.float32)
    embed = lambda v: v.reshape(len(v), -1)[:, :10]
    a = compute_fvd(vids_a, vids_b, embed, batch_size=7)
    b = fvd_from_features(embed(vids_a), embed(vids_b))
    np.testing.assert_allclose(a, b, rtol=1e-10)
