"""Frechet Video Distance (FVD) harness.

The reference publishes NO quality metrics (SURVEY.md §6: no FVD/FID/CLIP
score anywhere); this harness goes beyond parity so sample quality can be
scored, not just speed. FVD = Frechet distance between Gaussian fits of
video features from a fixed encoder:

    d^2 = |mu1 - mu2|^2 + tr(S1 + S2 - 2 (S1 S2)^(1/2))

The canonical encoder is an I3D pretrained on Kinetics-400; that asset
cannot be fetched in this environment (zero egress), so the extractor is
PLUGGABLE: pass any `embed_fn(videos (N,T,H,W,C) in [0,1]) -> (N,D)`.
The in-repo default is the trained ViViT video tower (a self-consistent
"ViViT-FVD") — comparable across checkpoints of the same run; for
literature-comparable numbers, supply an I3D embed_fn.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def feature_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(N, D) features -> (mean (D,), covariance (D, D))."""
    f = np.asarray(features, dtype=np.float64)
    assert f.ndim == 2 and f.shape[0] > 1, "need (N>1, D) features"
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_product_trace(s1: np.ndarray, s2: np.ndarray) -> float:
    """tr((S1 S2)^(1/2)) via the symmetric form A = S1^(1/2) S2 S1^(1/2):
    S1 S2 and A are similar matrices, so the trace of the sqrt is the sum of
    sqrt-eigenvalues of A (all real, >= 0 up to noise)."""
    w1, v1 = np.linalg.eigh((s1 + s1.T) / 2)
    w1 = np.clip(w1, 0.0, None)
    root1 = (v1 * np.sqrt(w1)) @ v1.T
    a = root1 @ ((s2 + s2.T) / 2) @ root1
    eig = np.linalg.eigvalsh((a + a.T) / 2)
    return float(np.sqrt(np.clip(eig, 0.0, None)).sum())


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """Frechet distance between two Gaussians (the FID/FVD formula)."""
    diff = np.asarray(mu1, np.float64) - np.asarray(mu2, np.float64)
    return float(
        diff @ diff
        + np.trace(sigma1)
        + np.trace(sigma2)
        - 2.0 * _sqrtm_product_trace(np.asarray(sigma1), np.asarray(sigma2))
    )


def fvd_from_features(real: np.ndarray, fake: np.ndarray) -> float:
    """FVD between two (N, D) feature sets."""
    mu_r, s_r = feature_stats(real)
    mu_f, s_f = feature_stats(fake)
    return frechet_distance(mu_r, s_r, mu_f, s_f)


def compute_fvd(
    real_videos: np.ndarray,
    fake_videos: np.ndarray,
    embed_fn: Callable[[np.ndarray], np.ndarray],
    batch_size: int = 16,
) -> float:
    """End-to-end: embed both video sets in batches, then FVD.

    videos: (N, T, H, W, C) in [0, 1]; embed_fn -> (n, D) per batch."""

    def embed_all(videos):
        outs = []
        for start in range(0, len(videos), batch_size):
            outs.append(np.asarray(embed_fn(videos[start : start + batch_size])))
        return np.concatenate(outs, axis=0)

    return fvd_from_features(embed_all(real_videos), embed_all(fake_videos))
