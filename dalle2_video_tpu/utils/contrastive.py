"""Contrastive CLIP loss + retrieval metrics.

Rebuild of reference ``dalle2_video/utils.py``:
  * CLIPLoss (:13-55): unit-norm embeds, logits = x @ y.T scaled by a
    LEARNED exp(temperature) (init 5.0), symmetric cross-entropy.
  * Classifier (:57-129): top-1 / top-10 retrieval accuracy from the
    cosine-similarity matrix.

TPU-first: ``sharded_clip_loss`` computes the full logit matrix under
data-parallel sharding with an explicit ``all_gather`` of the *other* tower
inside ``shard_map`` — each shard owns its rows, labels are offset by the
shard index, and the psum-mean gives the global symmetric loss
(SURVEY.md §5, distributed-communication entry).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dalle2_video_tpu.parallel.mesh import DATA_AXIS


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def _cross_entropy(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, targets[:, None], axis=-1).squeeze(-1)


def clip_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    temperature: jnp.ndarray,
    return_logits: bool = False,
):
    """Symmetric InfoNCE loss (reference CLIPLoss.forward, fast path).

    x, y: (b, ...) paired embeddings (flattened internally); temperature is
    the LEARNED log-scale parameter (logits *= exp(temperature), init 5.0).
    """
    b = x.shape[0]
    x = l2_normalize(x.reshape(b, -1))
    y = l2_normalize(y.reshape(b, -1))
    logits = (x @ y.T) * jnp.exp(temperature)
    targets = jnp.arange(b)
    loss = 0.5 * (
        _cross_entropy(logits, targets).mean()
        + _cross_entropy(logits.T, targets).mean()
    )
    if return_logits:
        return logits, loss
    return loss


def sharded_clip_loss(
    x: jnp.ndarray,
    y: jnp.ndarray,
    temperature: jnp.ndarray,
    mesh: Mesh,
    axis: str = DATA_AXIS,
) -> jnp.ndarray:
    """Global-batch symmetric CLIP loss with x, y sharded on ``axis``.

    Each shard all-gathers the opposite tower (one ICI collective per
    direction), computes its (local_b, global_b) logit rows with
    offset-diagonal targets, and psum-averages. Numerically equal to
    ``clip_loss`` on the gathered batch.
    """

    def local_loss(xs, ys):
        lb = xs.shape[0]
        xs = l2_normalize(xs.reshape(lb, -1))
        ys = l2_normalize(ys.reshape(lb, -1))
        idx = jax.lax.axis_index(axis)
        y_all = jax.lax.all_gather(ys, axis, tiled=True)  # (global_b, d)
        x_all = jax.lax.all_gather(xs, axis, tiled=True)
        scale = jnp.exp(temperature)
        targets = idx * lb + jnp.arange(lb)
        # image->text rows owned by this shard
        logits_xy = (xs @ y_all.T) * scale
        # text->image rows owned by this shard
        logits_yx = (ys @ x_all.T) * scale
        loss = 0.5 * (
            _cross_entropy(logits_xy, targets).sum()
            + _cross_entropy(logits_yx, targets).sum()
        )
        total = jax.lax.psum(loss, axis)
        global_b = lb * jax.lax.psum(1, axis)
        return total / global_b

    from jax import shard_map

    return shard_map(
        local_loss,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )(x, y)


def retrieval_metrics(
    z: jnp.ndarray, y: jnp.ndarray, topk: Tuple[int, ...] = (1, 10)
) -> dict:
    """Top-k retrieval accuracy over the cosine-similarity matrix
    (reference Classifier.forward, utils.py:66-113)."""
    b = z.shape[0]
    z = l2_normalize(z.reshape(b, -1))
    y = l2_normalize(y.reshape(b, -1))
    sim = z @ y.T  # (b, b)
    diags = jnp.arange(b)
    ranks = jnp.sum(sim >= jnp.take_along_axis(sim, diags[:, None], axis=1), axis=1)
    out = {}
    for k in topk:
        out[f"top{k}"] = jnp.mean((ranks <= k).astype(jnp.float32))
    return out
