"""Mixture-of-Experts feed-forward with expert parallelism (GShard-style).

Post-parity extension (SURVEY.md §2d): the reference has no MoE anywhere —
this provides the expert-parallel scaling axis for the prior's transformer
(the component that grows to billions of parameters in a production
DALL-E 2 deployment), the TPU-canonical way (GShard / Switch Transformer
lineage): dense one-hot dispatch/combine einsums with a static per-expert
capacity, so the whole layer is three big MXU einsums with static shapes —
no ragged gathers, no host-side routing. Sharding the stacked expert axis
P('model') (`moe_sharding_tree`) makes GSPMD insert the all-to-all-
equivalent collectives; no hand-written comms.

Router: top-2 gating (normalized over the kept pair), tokens over a
static capacity C = ceil(tokens/E * capacity_factor) are dropped for that
expert (they ride the residual connection — standard GShard semantics).
Load-balance auxiliary loss (Switch Transformer eq. 4): E * sum_e(f_e *
p_e), == 1 at perfectly uniform routing; emitted via `self.sow("losses",
"moe_aux", ...)` so trainers opt in with `mutable=["losses"]` and
samplers pay nothing.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import Mesh, PartitionSpec as P

from dalle2_video_tpu.models.layers import ScaleOnlyLayerNorm, torch_kernel_init
from dalle2_video_tpu.parallel.mesh import MODEL_AXIS


class MoEFF(nn.Module):
    """Drop-in replacement for the prior's _FF: pre-norm, residual, but the
    inner MLP is a top-2 mixture of `num_experts` experts.

    Input (b, n, dim) -> output (b, n, dim). Tokens are routed in one
    (b*n)-token group; every shape is static under jit.
    """

    dim: int
    num_experts: int
    mult: int = 4
    capacity_factor: float = 2.0
    swiglu: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, d = x.shape
        e = self.num_experts
        k = min(2, e)
        g = b * n
        cap = max(int(-(-g * self.capacity_factor // e)), 1)  # ceil
        inner = self.dim * self.mult

        y = ScaleOnlyLayerNorm(name="norm")(x).reshape(g, d)

        # --- router: top-k gating, normalized over the kept pair
        logits = nn.Dense(
            e, use_bias=False, kernel_init=torch_kernel_init, name="router"
        )(y)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        gate_vals, gate_idx = jax.lax.top_k(probs, k)  # (g, k)
        gate_vals = gate_vals / jnp.sum(gate_vals, axis=-1, keepdims=True)

        # --- capacity assignment: position of each (token, choice) within
        # its expert's queue, computed with a cumsum over the flattened
        # (choice-major) one-hot so the top-1 choices win slots first
        sel = jax.nn.one_hot(gate_idx, e, dtype=jnp.float32)  # (g, k, e)
        flat = sel.transpose(1, 0, 2).reshape(k * g, e)  # choice-major
        pos_flat = jnp.cumsum(flat, axis=0) * flat - 1.0  # slot per assignment
        pos = pos_flat.reshape(k, g, e).transpose(1, 0, 2)  # (g, k, e)
        keep = (pos >= 0) & (pos < cap)
        slot = jnp.sum(pos * sel, axis=-1)  # (g, k) slot in chosen expert
        slot_oh = jax.nn.one_hot(slot.astype(jnp.int32), cap, dtype=jnp.float32)

        # dispatch: (g, k, e) x (g, k, cap) -> (g, e, cap) {0,1}
        keep_sel = sel * keep.astype(jnp.float32)
        dispatch = jnp.einsum("gke,gkc->gec", keep_sel, slot_oh)
        # combine weights carry the gate values
        combine = jnp.einsum(
            "gke,gkc->gec", keep_sel * gate_vals[..., None], slot_oh
        )

        # --- expert computation: stacked params, three MXU einsums.
        # Shard the leading expert axis P('model') (moe_sharding_tree) for
        # expert parallelism; GSPMD partitions these einsums.
        xe = jnp.einsum("gd,gec->ecd", y, dispatch.astype(y.dtype))
        if self.swiglu:
            w1 = self.param(
                "experts_w1", nn.initializers.lecun_normal(), (e, d, 2 * inner)
            )
            h = jnp.einsum("ecd,edh->ech", xe, w1)
            a, gate = jnp.split(h, 2, axis=-1)
            h = a * nn.silu(gate)
        else:
            w1 = self.param(
                "experts_w1", nn.initializers.lecun_normal(), (e, d, inner)
            )
            h = nn.gelu(jnp.einsum("ecd,edh->ech", xe, w1), approximate=False)
        w2 = self.param(
            "experts_w2", nn.initializers.lecun_normal(), (e, inner, d)
        )
        ye = jnp.einsum("ech,ehd->ecd", h, w2)
        out = jnp.einsum("ecd,gec->gd", ye, combine.astype(ye.dtype))

        # --- Switch load-balance aux: E * sum_e(fraction_routed * mean_prob).
        # Not sown at init so checkpointed variables stay params-only.
        if not self.is_initializing():
            f_e = jnp.mean(
                jax.nn.one_hot(gate_idx[:, 0], e, dtype=jnp.float32), axis=0
            )
            p_e = jnp.mean(probs, axis=0)
            self.sow("losses", "moe_aux", e * jnp.sum(f_e * p_e))

        return x + out.reshape(b, n, d)


def moe_sharding_tree(tree: Any, mesh: Mesh, axis: str = MODEL_AXIS):
    """NamedSharding tree for expert parallelism: every `experts_*` leaf is
    sharded P(axis) on its num_experts dim — the leading dim, or dim 1 when
    the leaf sits under a scanned "layers" subtree (leading dim = depth,
    models/prior.py scan_layers). Everything else replicated. Sharing the
    'model' axis with pipeline parallelism is NOT supported — pick one per
    run (pipeline_sharding_tree vs this)."""
    size = mesh.shape[axis]

    def spec(path, leaf):
        keys = {str(getattr(p, "key", "")) for p in path}
        if not any(s.startswith("experts_") for s in keys):
            return jax.sharding.NamedSharding(mesh, P())
        dim = 1 if "layers" in keys else 0
        if getattr(leaf, "ndim", 0) > dim and leaf.shape[dim] % size == 0:
            parts = [None] * (dim + 1)
            parts[dim] = axis
            return jax.sharding.NamedSharding(mesh, P(*parts))
        return jax.sharding.NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec, tree)
