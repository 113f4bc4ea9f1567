"""Sequence-parallel joint attention (post-parity extension, SURVEY.md §5).

The reference's only long-context pressure point is the joint t*h*w
bottleneck attention (23k tokens at the shipped 90x128x128 config); it has
no sequence parallelism of any kind. Because our Attention is multi-query
(one shared kv head of dim ~32), exact sequence parallelism is almost free
on TPU: shard the TOKEN axis across the mesh, all-gather only the tiny
k/v stream (a few MB) over ICI, and run the FLASH kernel on each shard's
query rows against the full kv — no ring pipeline needed (that is the MHA
regime). Communication per layer: 2 * b * n * d_head bytes.

r3 (VERDICT r2 #5): the local compute is the Pallas flash-MQA kernel
(fwd + streaming bwd), NOT a materialized (b, h, n_local, m_global) sim —
at the 23k regime a shard's sim would still be multi-GB; the flash kernel
keeps it at block tiles. The learned null kv is passed separately
(replicated) and prepended AFTER the gather so the sharded token count
stays divisible by the mesh axis.

Exactness: identical math to single-device attention (verified in
tests/test_trainer.py::test_sequence_parallel_mqa_matches_local, incl.
gradients through the shard_map + custom-VJP kernel).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dalle2_video_tpu.ops.pallas.flash_mqa import mqa_attention
from dalle2_video_tpu.parallel.mesh import MODEL_AXIS


def sequence_parallel_mqa(
    q: jnp.ndarray,  # (b, n, h, d) — token axis n sharded over `axis`
    k: jnp.ndarray,  # (b, n, d) single kv head (real tokens, NO null kv)
    v: jnp.ndarray,  # (b, n, d)
    mesh: Mesh,
    *,
    sm_scale: float,
    axis: str = MODEL_AXIS,
    null_kv: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,  # each (b,1,d)
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Exact MQA attention with the sequence axis sharded over the mesh.

    Inputs may be given unsharded (shard_map partitions them); output comes
    back with the same (b, n, h, d) logical shape, token axis sharded.
    Differentiable end to end (all_gather transposes to psum_scatter; the
    flash kernel brings its own streaming VJP).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    def local(q_loc, k_loc, v_loc, *null):
        # gather the full (tiny) kv stream over ICI; queries stay local
        k_all = jax.lax.all_gather(k_loc, axis, axis=1, tiled=True)
        v_all = jax.lax.all_gather(v_loc, axis, axis=1, tiled=True)
        if null:
            nk, nv = null
            k_all = jnp.concatenate([nk, k_all], axis=1)
            v_all = jnp.concatenate([nv, v_all], axis=1)
        return mqa_attention(
            q_loc, k_all, v_all, sm_scale=sm_scale, interpret=interpret
        )

    in_specs = [P(None, axis), P(None, axis), P(None, axis)]
    args = [q, k, v]
    if null_kv is not None:
        in_specs += [P(), P()]
        args += list(null_kv)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=P(None, axis),
        check_vma=False,
    )(*args)
