"""Batched PRNG key plumbing for per-sample reproducible sampling.

Every sampling entry point in this package accepts either

  * a single PRNG key — the whole batch shares one noise stream (the
    reference's semantics: one global torch RNG, dalle2_video.py:1707-1755),
    where row i's noise depends on its position and the batch size; or
  * a BATCH of per-row keys (leading dim == batch size) — every random
    draw is vmapped over rows, so row i's entire noise stream is a pure
    function of key i. This is what makes served generation reproducible
    per request: the same (prompt, seed) returns the same video no matter
    which micro-batch group it rode in, how the group was padded, or how
    a large batch was chunked (`max_batch_size`).

Both raw uint32 keys (`jax.random.PRNGKey`: single (2,), batched (b, 2))
and new-style typed keys (`jax.random.key`: single (), batched (b,)) are
supported.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np


def is_batched(key: jax.Array) -> bool:
    """True if `key` is a batch of per-row keys rather than a single key."""
    if jax.dtypes.issubdtype(key.dtype, jax.dtypes.prng_key):
        return key.ndim >= 1
    return key.ndim >= 2


def batch_size(key: jax.Array) -> int:
    assert is_batched(key)
    return key.shape[0]


def batch_keys(seeds: Union[Sequence[int], np.ndarray]) -> jax.Array:
    """(b,) integer seeds -> (b, 2) raw per-row keys (one PRNGKey per seed)."""
    seeds = jnp.asarray(np.asarray(seeds, dtype=np.uint32))
    return jax.vmap(jax.random.PRNGKey)(seeds)


def split(key: jax.Array, num: int = 2) -> jax.Array:
    """Single key -> (num, …) like jax.random.split; batched (b, …) keys ->
    (num, b, …) so out[i] is itself a batched key aligned with the rows."""
    if not is_batched(key):
        return jax.random.split(key, num)
    ks = jax.vmap(lambda k: jax.random.split(k, num))(key)  # (b, num, …)
    return jnp.swapaxes(ks, 0, 1)


def fold_in(key: jax.Array, data) -> jax.Array:
    """fold_in that maps over batched keys (same `data` folded into each)."""
    if not is_batched(key):
        return jax.random.fold_in(key, data)
    return jax.vmap(lambda k: jax.random.fold_in(k, data))(key)


def normal(key: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """jax.random.normal that draws PER ROW for batched keys: row i of the
    (b, …) result is normal(key[i], shape[1:]) — independent of the batch
    size, the other rows, and row order."""
    if not is_batched(key):
        return jax.random.normal(key, shape, dtype)
    assert shape[0] == key.shape[0], (
        f"batched keys ({key.shape[0]}) must match batch dim ({shape[0]})"
    )
    return jax.vmap(lambda k: jax.random.normal(k, tuple(shape[1:]), dtype))(key)


def take(key: jax.Array, start: int, size: int) -> jax.Array:
    """Row-slice a batched key (chunked sampling keeps each row's key);
    identity for a single key (callers re-split per chunk instead)."""
    if not is_batched(key):
        return key
    return key[start : start + size]
