"""Pipeline parallelism (GPipe fill-drain schedule) over the device mesh.

Post-parity extension (SURVEY.md §2d): the reference has no pipeline
parallelism of any kind (its DeepSpeed config is ZeRO stage 1 only,
reference configs/deepspeed_config.json) — but a production prior at DALL-E 2
scale (billions of parameters of uniform transformer stack) is exactly the
workload pipeline parallelism exists for. This module implements it the TPU
way: a single SPMD program under `shard_map`, with

  * the LAYER axis of a stacked parameter pytree sharded over a mesh axis
    (each device holds L/S contiguous layers = one stage),
  * a `lax.scan` over M + S - 1 ticks; each tick every device applies its
    stage and `lax.ppermute` shifts activations to the next stage over ICI,
  * microbatches streamed in at stage 0, collected at stage S-1, and
    broadcast back with a masked `psum`.

Fill/drain bubble: of the M + S - 1 ticks, only M carry each device's
useful work, so the overhead factor is (S - 1) / M — pick microbatches >>
stages. (A 1F1B schedule would reduce peak activation memory, not the
bubble; with JAX autodiff the backward pass of this scan IS the reverse
pipeline, so fill-drain is what falls out and memory is bounded by the
scan's saved residuals — use `jax.checkpoint` on `layer_fn` to trade
recompute for memory at scale.)

Differentiable end to end: `ppermute` transposes to the inverse permute,
the masked `psum` to a broadcast, so `jax.grad` of a pipelined loss runs
the textbook backward pipeline without any hand-written schedule.

Exactness: identical math to running the layers sequentially — verified
including gradients in tests/test_pipeline.py.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from dalle2_video_tpu.parallel.mesh import MODEL_AXIS


def pipeline_apply(
    layer_fn: Callable[..., jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    mesh: Mesh,
    *,
    microbatches: int,
    axis: str = MODEL_AXIS,
    batch_axis: Optional[str] = None,
    broadcast_args: tuple = (),
) -> jnp.ndarray:
    """Apply L stacked layers to `x` as an S-stage GPipe pipeline.

    Args:
      layer_fn: ``layer_fn(layer_params, x, *broadcast_args) -> x`` applying
        ONE layer; must preserve x's shape and dtype (uniform stages — the
        transformer regime).
      stacked_params: pytree whose every leaf has a leading layer axis of
        size L (the layout `nn.scan` produces); L must divide by the pipe
        axis size S. Sharded P(axis) on that leading axis — each device
        keeps only its own stage's parameters (the memory win that makes
        pipelining worth the bubble).
      x: (b, ...) activations; b must divide by `microbatches` (and by the
        data-axis size first, when `batch_axis` is given).
      microbatches: M microbatches streamed through the pipe. The bubble
        overhead is (S-1)/M of a step — pick M >= S.
      axis: mesh axis carrying the stages (default: the 'model' axis).
      batch_axis: optionally shard the batch over this mesh axis too —
        DP x PP composition in the same shard_map.
      broadcast_args: extra layer_fn inputs replicated to every stage
        (e.g. a shared attention bias).

    Returns x after all L layers, numerically identical to sequential
    application.
    """
    stages = mesh.shape[axis]
    n_layers = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if n_layers % stages != 0:
        raise ValueError(f"{n_layers} layers not divisible by {stages} stages")
    m = microbatches
    if m < 1:
        raise ValueError("microbatches must be >= 1")

    def local(p_loc, x_full, *bcast):
        s = jax.lax.axis_index(axis)
        b = x_full.shape[0]
        assert b % m == 0, f"local batch {b} not divisible by microbatches {m}"
        mb = b // m
        rest = x_full.shape[1:]
        xs = x_full.reshape((m, mb) + rest)

        def stage(x):
            def body(x, pl):
                return layer_fn(pl, x, *bcast), None

            x, _ = jax.lax.scan(body, x, p_loc)
            return x

        perm = [(i, (i + 1) % stages) for i in range(stages)]

        def tick(carry, t):
            buf, outs = carry
            # stage 0 reads microbatch t (clamped into range during drain);
            # later stages consume what the previous stage permuted in
            inp = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, m - 1), keepdims=False
            )
            x_in = jnp.where(s == 0, inp, buf)
            y = stage(x_in)
            # the last stage finishes microbatch t-(S-1) at tick t
            idx = t - (stages - 1)
            write = (s == stages - 1) & (idx >= 0) & (idx < m)
            ci = jnp.clip(idx, 0, m - 1)
            cur = jax.lax.dynamic_index_in_dim(outs, ci, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, cur), ci, 0
            )
            buf = jax.lax.ppermute(y, axis, perm)
            return (buf, outs), None

        buf0 = jnp.zeros((mb,) + rest, x_full.dtype)
        outs0 = jnp.zeros((m, mb) + rest, x_full.dtype)
        (_, outs), _ = jax.lax.scan(
            tick, (buf0, outs0), jnp.arange(m + stages - 1)
        )
        # only stage S-1 holds real outputs; masked psum broadcasts them
        outs = jax.lax.psum(
            jnp.where(s == stages - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs.reshape(x_full.shape)

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    xspec = P(batch_axis) if batch_axis else P()
    bspecs = tuple(P() for _ in broadcast_args)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(pspec, xspec) + bspecs,
        out_specs=xspec,
        check_vma=False,
    )(stacked_params, x, *broadcast_args)


# --------------------------------------------------------------------- #
# CausalTransformer parameter layout converters: the legacy per-name loop
# stores layer i under f"attn{i}"/f"ff{i}"; scan_layers=True stores one
# "layers" subtree with every leaf stacked (depth, ...). Checkpoints from
# either layout convert losslessly to the other.
# --------------------------------------------------------------------- #


def pipeline_sharding_tree(tree: Any, mesh: Mesh, axis: str = MODEL_AXIS):
    """NamedSharding tree for a params/opt-state pytree of a pipelined
    model: every leaf living under a "layers" subtree (the nn.scan stacked
    layout) is sharded P(axis) on its leading layer dim — each stage's
    device keeps only its own layers (the pipeline's memory win) — and
    everything else is replicated. Works on optimizer state too (adam
    mu/nu embed the params tree structure)."""
    size = mesh.shape[axis]

    def spec(path, leaf):
        keys = {getattr(p, "key", None) for p in path}
        if (
            "layers" in keys
            and getattr(leaf, "ndim", 0) >= 1
            and leaf.shape[0] % size == 0
        ):
            return jax.sharding.NamedSharding(mesh, P(axis))
        return jax.sharding.NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, tree)


def stack_transformer_params(tparams: dict) -> dict:
    """Legacy loop layout -> scan/pipeline layout (for a CausalTransformer
    params subtree, i.e. params['transformer'] of DiffusionPriorNetwork)."""
    depth = sum(1 for k in tparams if k.startswith("attn"))
    assert depth and all(
        f"ff{i}" in tparams and f"attn{i}" in tparams for i in range(depth)
    ), "not a legacy CausalTransformer params subtree"
    attn = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[tparams[f"attn{i}"] for i in range(depth)]
    )
    ff = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[tparams[f"ff{i}"] for i in range(depth)]
    )
    out = {
        k: v
        for k, v in tparams.items()
        if not (k.startswith("attn") or k.startswith("ff"))
    }
    out["layers"] = {"attn": attn, "ff": ff}
    return out


def unstack_transformer_params(tparams: dict) -> dict:
    """Scan/pipeline layout -> legacy loop layout."""
    layers = tparams["layers"]
    depth = jax.tree_util.tree_leaves(layers)[0].shape[0]
    out = {k: v for k, v in tparams.items() if k != "layers"}
    for i in range(depth):
        out[f"attn{i}"] = jax.tree_util.tree_map(lambda x: x[i], layers["attn"])
        out[f"ff{i}"] = jax.tree_util.tree_map(lambda x: x[i], layers["ff"])
    return out
