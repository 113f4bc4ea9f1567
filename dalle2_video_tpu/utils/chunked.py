"""Chunked application utilities.

Rebuild of reference ``sequential_apply`` (utils.py:132-175) and the
``split_args_and_kwargs`` micro-batch chunking used by the trainer
(trainer.py:335-360) and sampling decorators: apply a function over a large
batch in fixed-size chunks to bound peak memory. On TPU the chunk loop runs
on host over jitted calls — every chunk reuses one compiled program
(identical static shapes except a possible tail chunk).
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def split_batch(batch_size: int, max_chunk: int) -> Iterator[Tuple[int, int]]:
    """Yield (start, size) spans covering [0, batch_size)."""
    start = 0
    while start < batch_size:
        size = min(max_chunk, batch_size - start)
        yield start, size
        start += size


def chunked_apply(
    fn: Callable[..., Any],
    batch_size: int,
    max_chunk: int,
    *args,
    pad_tail: bool = True,
    **kwargs,
):
    """Apply ``fn`` over leading-axis chunks of every array arg and
    concatenate the results. With ``pad_tail`` the last chunk is padded to
    ``max_chunk`` (and the padding sliced off) so only ONE program shape is
    ever compiled."""
    is_arr = lambda a: hasattr(a, "shape") and getattr(a, "ndim", 0) >= 1

    outs = []
    for start, size in split_batch(batch_size, max_chunk):
        take = lambda a: a[start : start + size] if is_arr(a) else a
        c_args = [take(a) for a in args]
        c_kwargs = {k: take(v) for k, v in kwargs.items()}
        if pad_tail and size < max_chunk:
            pad = lambda a: (
                jnp.concatenate(
                    [a, jnp.zeros((max_chunk - size, *a.shape[1:]), a.dtype)]
                )
                if is_arr(a)
                else a
            )
            c_args = [pad(a) for a in c_args]
            c_kwargs = {k: pad(v) for k, v in c_kwargs.items()}
        out = fn(*c_args, **c_kwargs)
        if pad_tail and size < max_chunk:
            out = jax.tree_util.tree_map(lambda o: o[:size], out)
        outs.append(out)
    if len(outs) == 1:
        return outs[0]
    return jax.tree_util.tree_map(lambda *xs: jnp.concatenate(xs, axis=0), *outs)
