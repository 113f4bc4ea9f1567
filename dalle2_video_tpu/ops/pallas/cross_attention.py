"""Fused tiny-context cross-attention Pallas kernel.

Every conditioned ResnetBlock cross-attends t*h*w video tokens to a tiny
conditioning set (2 time tokens + 4 embed tokens + null = 7 keys; reference
dalle2_video.py:160-205). XLA materializes the (b, h, n, ctx) similarity
tensor with ctx padded to the 128-lane tile (~9-18x waste; it dominated the
B=32 OOM — docs/PERF.md #2). Because the whole context fits in VMEM, this
kernel computes softmax(q k^T * scale) v for a block of queries in ONE pass:
HBM traffic is exactly {read q, k, v; write out} — no sim tensor ever
leaves VMEM.

Layout: heads folded into the batch axis (each head has its own kv in
cross-attention, unlike the MQA self-attention). Forward-only — used on the
sampling path via attention_impl="flash" (training keeps XLA autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, o_ref, *, sm_scale: float):
    q = q_ref[0]  # (BLOCK_N, d)
    k = k_ref[0]  # (m, d)
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BLOCK_N, m) — lives only in VMEM/registers
    s = s * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "block_n", "interpret"))
def fused_cross_attention(
    q: jnp.ndarray,  # (bh, n, d) — batch*heads folded
    k: jnp.ndarray,  # (bh, m, d) — m small (fits VMEM alongside a q block)
    v: jnp.ndarray,  # (bh, m, d)
    *,
    sm_scale: float,
    block_n: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    bh, n, d = q.shape
    _, m, _ = k.shape
    n_pad = (n + block_n - 1) // block_n * block_n
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale),
        grid=(bh, n_pad // block_n),
        in_specs=[
            pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0)),
            pl.BlockSpec((1, m, d), lambda bi, ni: (bi, 0, 0)),
            pl.BlockSpec((1, m, d), lambda bi, ni: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_n, d), lambda bi, ni: (bi, ni, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v)
    return out[:, :n]


def cross_attention(
    q: jnp.ndarray,  # (b, n, h, d)
    k: jnp.ndarray,  # (b, m, h, d)
    v: jnp.ndarray,  # (b, m, h, d)
    *,
    sm_scale: float,
    block_n: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Wrapper matching models.layers.CrossAttention's einsum semantics.
    Returns (b, n, h, d)."""
    b, n, h, d = q.shape
    m = k.shape[1]
    fold = lambda a, s: a.transpose(0, 2, 1, 3).reshape(b * h, s, d)
    out = fused_cross_attention(
        fold(q, n), fold(k, m), fold(v, m),
        sm_scale=sm_scale, block_n=block_n, interpret=interpret,
    )
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
