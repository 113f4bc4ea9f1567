"""Sequence-parallel joint attention (post-parity extension, SURVEY.md §5).

The reference's only long-context pressure point is the joint t*h*w
bottleneck attention (23k tokens at the shipped 90x128x128 config); it has
no sequence parallelism of any kind. Because our Attention is multi-query
(one shared kv head of dim ~32), exact sequence parallelism is almost free
on TPU: shard the TOKEN axis across the mesh, all-gather only the tiny
k/v stream (dozens of MB at most) over ICI, and compute each shard's query
rows against the full kv locally — no ring pipeline needed (that is the
MHA regime). Communication per layer: 2 * b * n * d_head bytes.

Exactness: identical math to single-device attention (verified in
tests/test_trainer.py::test_sequence_parallel_mqa_matches_local).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dalle2_video_tpu.parallel.mesh import MODEL_AXIS


def sequence_parallel_mqa(
    q: jnp.ndarray,  # (b, n, h, d) — token axis n sharded over `axis`
    k: jnp.ndarray,  # (b, m, d) single kv head — m sharded over `axis`
    v: jnp.ndarray,  # (b, m, d)
    mesh: Mesh,
    *,
    sm_scale: float,
    axis: str = MODEL_AXIS,
) -> jnp.ndarray:
    """Exact MQA attention with the sequence axis sharded over the mesh.

    Inputs may be given unsharded (shard_map partitions them); output comes
    back with the same (b, n, h, d) logical shape, token axis sharded.
    """

    def local(q_loc, k_loc, v_loc):
        # gather the full (tiny) kv stream; queries stay local
        k_all = jax.lax.all_gather(k_loc, axis, axis=1, tiled=True)  # (b, m, d)
        v_all = jax.lax.all_gather(v_loc, axis, axis=1, tiled=True)
        sim = jnp.einsum("bnhd,bmd->bhnm", q_loc * sm_scale, k_all)
        attn = jax.nn.softmax(sim, axis=-1)
        return jnp.einsum("bhnm,bmd->bnhd", attn, v_all)

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis)),
        out_specs=P(None, axis),
        check_rep=False,
    )(q, k, v)
