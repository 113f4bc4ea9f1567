"""Sharded train/sample step factories — the GSPMD replacement for
Accelerate/DeepSpeed (reference trainer.py:30,102,117-126 + ZeRO json).

Strategy (SURVEY.md §2d):
  * batch axis -> 'data' (DP): the partitioner inserts the gradient psum
    over ICI, replacing NCCL all-reduce.
  * optimizer state (adam mu/nu) -> sharded along 'data' on each leaf's
    largest divisible axis (ZeRO-1 equivalent, replacing DeepSpeed stage-1
    + CPU offload — no host offload needed at this scale in HBM).
  * params -> replicated by default; 'model' axis reserved for TP of
    attention/dense kernels (wired via sharding rules below).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dalle2_video_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, active_mesh
from dalle2_video_tpu.train.trainer import DecoderTrainer, TrainState


def _leaf_zero1_spec(leaf, data_size: int) -> P:
    """ZeRO-1-style spec: shard the largest axis divisible by the data-axis
    size; replicate scalars/small leaves."""
    shape = getattr(leaf, "shape", ())
    if not shape:
        return P()
    best_axis, best_len = None, 0
    for ax, ln in enumerate(shape):
        if ln % data_size == 0 and ln > best_len:
            best_axis, best_len = ax, ln
    if best_axis is None or best_len < data_size:
        return P()
    spec = [None] * len(shape)
    spec[best_axis] = DATA_AXIS
    return P(*spec)


def zero1_sharding_tree(tree: Any, mesh: Mesh):
    """NamedSharding tree for optimizer state: ZeRO-1 partitioning."""
    data_size = mesh.shape[DATA_AXIS]
    return jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, _leaf_zero1_spec(leaf, data_size)), tree
    )


def replicated_tree(tree: Any, mesh: Mesh):
    return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), tree)


def _leaf_tp_spec(leaf, model_size: int, min_width: int = 128) -> P:
    """Megatron-style column parallelism: shard the output-feature (last)
    axis of wide kernels over 'model'; GSPMD derives activation shardings
    and inserts the collectives. min_width guards against sharding kernels
    too narrow to be worth the collectives."""
    shape = getattr(leaf, "shape", ())
    if (
        len(shape) >= 2
        and shape[-1] % model_size == 0
        and shape[-1] >= min_width
    ):
        spec = [None] * len(shape)
        spec[-1] = MODEL_AXIS
        return P(*spec)
    return P()


def state_shardings(
    state: TrainState, mesh: Mesh, zero1: bool = True, tp: bool = False,
    tp_min_width: int = 128,
) -> TrainState:
    """Sharding pytree matching a TrainState: params replicated (or TP column
    sharded over 'model'); optimizer state + EMA mirror the param sharding,
    plus ZeRO-1 data-axis sharding where divisible."""
    model_size = mesh.shape[MODEL_AXIS]
    use_tp = tp and model_size > 1

    def param_spec(leaf) -> P:
        return _leaf_tp_spec(leaf, model_size, tp_min_width) if use_tp else P()

    params_sh = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, param_spec(leaf)), state.params
    )

    def opt_spec(leaf) -> P:
        tp_spec = list(param_spec(leaf)) + [None] * (
            getattr(leaf, "ndim", 0) - len(param_spec(leaf))
        )
        if zero1:
            z = _leaf_zero1_spec(leaf, mesh.shape[DATA_AXIS])
            z = list(z) + [None] * (getattr(leaf, "ndim", 0) - len(z))
            merged = [
                (t if t is not None else d) for t, d in zip(tp_spec, z)
            ]
            return P(*merged)
        return P(*tp_spec)

    opt_sh = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, opt_spec(leaf)), state.opt_states
    )
    ema_sh = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(mesh, param_spec(leaf)), state.ema
    )
    steps_sh = NamedSharding(mesh, P())
    return TrainState(
        params=params_sh, opt_states=opt_sh, ema=ema_sh, steps=steps_sh
    )


def shard_state(
    state: TrainState, mesh: Mesh, zero1: bool = True, tp: bool = False,
    tp_min_width: int = 128,
) -> TrainState:
    sh = state_shardings(state, mesh, zero1, tp, tp_min_width)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, sh,
        is_leaf=lambda x: x is None,
    )


def make_sharded_train_step(
    trainer: DecoderTrainer,
    mesh: Mesh,
    unet_number: int = 1,
    *,
    with_embed: bool = True,
    with_text: bool = False,
    zero1: bool = True,
    donate_state: bool = False,
):
    """Compile one data-parallel train step over the mesh.

    Returns step(state, rng, video[, video_embed][, text_encodings])
    -> (state, loss). Batch arrays must be sharded P('data') on axis 0
    (use parallel.mesh.shard_batch).

    donate_state defaults to False: buffer donation crashes the axon TPU
    runtime with INVALID_ARGUMENT (docs/PERF.md) — CPU-mesh users may opt in
    to save the state copy.
    """
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def step(state, rng, video, video_embed=None, text_encodings=None):
        # the trace runs under active_mesh so mesh-aware layers (sequence-
        # parallel attention) can discover the mesh at trace time
        with active_mesh(mesh):
            return trainer.train_step(
                state, rng, video,
                video_embed=video_embed,
                text_encodings=text_encodings,
                unet_number=unet_number,
            )

    in_shardings: list = [None, repl, batch_sh]
    if with_embed:
        in_shardings.append(batch_sh)
    if with_text:
        in_shardings.append(batch_sh)

    def wrapped(state, rng, video, *conds):
        video_embed = conds[0] if with_embed else None
        text = (conds[1] if with_embed else conds[0]) if with_text else None
        return step(state, rng, video, video_embed, text)

    return jax.jit(
        wrapped,
        in_shardings=tuple(in_shardings),
        donate_argnums=(0,) if donate_state else (),
    )


def make_sharded_train_steps_scan(
    trainer: DecoderTrainer,
    mesh: Mesh,
    unet_number: int = 1,
    *,
    with_embed: bool = True,
    with_text: bool = False,
    donate_state: bool = False,
):
    """K optimizer steps fused into one compiled dispatch over the mesh
    (trainer.train_steps_scan). Batch arrays are (K, B, ...) with B sharded
    P('data') on axis 1. Amortizes the per-dispatch tunnel overhead
    (docs/PERF.md #5); K is baked into the compiled shape."""
    batch_sh = NamedSharding(mesh, P(None, DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def wrapped(state, rng, videos, *conds):
        video_embeds = conds[0] if with_embed else None
        text = (conds[1] if with_embed else conds[0]) if with_text else None
        with active_mesh(mesh):
            return trainer.train_steps_scan(
                state, rng, videos,
                video_embeds=video_embeds,
                text_encodings=text,
                unet_number=unet_number,
            )

    in_shardings: list = [None, repl, batch_sh]
    if with_embed:
        in_shardings.append(batch_sh)
    if with_text:
        in_shardings.append(batch_sh)

    return jax.jit(
        wrapped,
        in_shardings=tuple(in_shardings),
        donate_argnums=(0,) if donate_state else (),
    )


def make_sharded_sample_stage(decoder, mesh: Mesh, stage_index: int, **fixed):
    """Jit one cascade stage's sampler with batch-data sharding."""
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())

    def run(params, rng, video_embed, prev_video):
        with active_mesh(mesh):
            return decoder.sample_stage(
                stage_index, params, rng,
                batch_size=video_embed.shape[0],
                prev_video=prev_video,
                video_embed=video_embed,
                **fixed,
            )

    return jax.jit(run, in_shardings=(repl, repl, batch_sh, batch_sh))


def make_data_parallel_sampler(sample_fn, mesh: Mesh):
    """Wrap a batched sampler for data-parallel serving over the mesh.

    `sample_fn(*arrays) -> (b, ...)` where every argument has the batch as
    its leading dimension (e.g. tokens, per-row PRNG keys). The wrapper
    jits the function with each argument sharded over the mesh's data axis
    and the output sharded the same way, so one dispatched serving group
    runs across all devices (the TPU equivalent of multi-GPU serving
    replicas — except it is ONE program, so batching efficiency and the
    micro-batcher's coalescing carry over unchanged).

    Model params should be captured (closed over) by `sample_fn`; GSPMD
    replicates them. Batch sizes must divide the data-axis size — pick
    serving buckets as multiples of it (scripts/serve.py rounds the
    configured buckets up). With per-row PRNG keys (utils/keys.py) each
    row's draws are key-pure, so sharded and single-device serving return
    identical samples.
    """
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    def run(*arrays):
        with active_mesh(mesh):
            return sample_fn(*arrays)

    n_args = None  # in_shardings must match arity; resolve lazily

    def wrapped(*arrays):
        nonlocal n_args
        if n_args is None:
            n_args = len(arrays)
            wrapped.jitted = jax.jit(
                run,
                in_shardings=(batch_sh,) * n_args,
                out_shardings=batch_sh,
            )
        data = mesh.shape[DATA_AXIS]
        b = arrays[0].shape[0]
        assert b % data == 0, (
            f"serving batch {b} must be a multiple of the data axis ({data})"
        )
        return wrapped.jitted(*arrays)

    return wrapped
