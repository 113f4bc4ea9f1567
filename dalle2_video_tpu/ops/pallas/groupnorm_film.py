"""Fused GroupNorm + FiLM + SiLU Pallas kernel.

The reference's Block3D tail is GroupNorm(8) -> FiLM scale/shift -> SiLU
(reference dalle2_video.py:99-133); it runs ~30 times per UNet3D forward
over full-resolution fmaps. flax GroupNorm materializes a full f32 copy of
the bf16 input for its statistics (seen as 1GB `norm/convert_element_type`
allocations in the B=32 OOM dump — docs/PERF.md): this kernel streams the
input twice (f32 accumulation in VMEM scratch, no f32 materialization) and
fuses normalize + affine + FiLM + SiLU into the second pass.

Algebra: (xhat*gamma + beta)*(scale+1) + shift == xhat*A + B with
A = gamma*(scale+1), B = beta*(scale+1) + shift — A/B are tiny (B, C)
vectors precomputed in XLA and passed as (B, 1, C) f32 blocks. (Real-TPU
BlockSpecs require trailing block dims divisible by (8, 128) or equal to
the array dims — (1, C) blocks of a (B, C) array are rejected, and dynamic
bf16 sublane row loads are unsupported; both learned the hard way.)

Grid: (B, 2 phases, L blocks), sequential per batch row so the per-channel
sum/sumsq scratch persists across the L sweep:
  phase 0: accumulate per-channel sum / sum-of-squares (masked tail)
  phase 1: matmul-fold channels->groups (Mosaic forbids lane reshapes),
           then silu(xhat*A + B)

Gradients: jax.custom_vjp; the backward recomputes statistics from the
saved raw inputs (standard recompute backward, pure XLA).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_ref,    # (1, BL, C)
    a_ref,    # (1, 1, C) f32: gamma*(scale+1) for this batch row
    b_ref,    # (1, 1, C) f32: beta*(scale+1)+shift
    o_ref,    # (1, BL, C)
    sum_s,    # (1, C) f32 scratch
    sq_s,     # (1, C) f32 scratch
    mean_s,   # (1, C) f32 scratch (per-channel broadcast of group mean)
    rstd_s,   # (1, C) f32 scratch
    *,
    groups: int,
    eps: float,
    seq_len: int,
    block_l: int,
):
    p = pl.program_id(1)
    li = pl.program_id(2)
    n_l = pl.num_programs(2)

    @pl.when((p == 0) & (li == 0))
    def _init():
        sum_s[:] = jnp.zeros_like(sum_s)
        sq_s[:] = jnp.zeros_like(sq_s)

    @pl.when(p == 0)
    def _accumulate():
        x = x_ref[0].astype(jnp.float32)  # (BL, C)
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + li * block_l
        valid = (row < seq_len).astype(jnp.float32)
        xv = x * valid
        sum_s[:] = sum_s[:] + jnp.sum(xv, axis=0, keepdims=True)
        sq_s[:] = sq_s[:] + jnp.sum(xv * xv, axis=0, keepdims=True)

    @pl.when((p == 0) & (li == n_l - 1))
    def _finalize_stats():
        # group-fold via a (C, G) membership-matrix matmul — Mosaic does not
        # support lane reshapes like (1, C) -> (G, C/G) on real TPUs
        c = sum_s.shape[1]
        cg = c // groups
        n_el = jnp.float32(seq_len * cg)
        chan_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
        group_id = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
        member = (chan_group == group_id).astype(jnp.float32)  # (C, G)
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        g_sum = dot(sum_s[:], member)  # (1, G)
        g_sq = dot(sq_s[:], member)
        mean = g_sum / n_el
        var = g_sq / n_el - mean * mean
        rstd = jax.lax.rsqrt(var + eps)
        mean_s[:] = dot(mean, member.T)  # broadcast back to (1, C)
        rstd_s[:] = dot(rstd, member.T)

    @pl.when(p == 1)
    def _normalize():
        x = x_ref[0].astype(jnp.float32)
        y = (x - mean_s[:]) * rstd_s[:]
        y = y * a_ref[0] + b_ref[0]
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _fwd_impl(x, gamma, beta, scale, shift, groups, eps, block_l, interpret):
    b, l, c = x.shape
    l_pad = (l + block_l - 1) // block_l * block_l
    if l_pad != l:
        x_in = jnp.pad(x, ((0, 0), (0, l_pad - l), (0, 0)))
    else:
        x_in = x
    n_l = l_pad // block_l

    # fold GN affine + FiLM into two per-batch channel vectors (module doc)
    g32 = gamma.astype(jnp.float32)[None, :]
    b32 = beta.astype(jnp.float32)[None, :]
    s32 = scale.astype(jnp.float32)
    t32 = shift.astype(jnp.float32)
    a_vec = (g32 * (s32 + 1.0))[:, None, :]  # (B, 1, C)
    b_vec = (b32 * (s32 + 1.0) + t32)[:, None, :]

    out = pl.pallas_call(
        functools.partial(
            _kernel, groups=groups, eps=eps, seq_len=l, block_l=block_l
        ),
        grid=(b, 2, n_l),
        in_specs=[
            pl.BlockSpec((1, block_l, c), lambda bi, p, li: (bi, li, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, p, li: (bi, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda bi, p, li: (bi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_l, c), lambda bi, p, li: (bi, li, 0)),
        out_shape=jax.ShapeDtypeStruct((b, l_pad, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
            pltpu.VMEM((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # batch rows independent; phase+L sweep carry scratch state
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(x_in, a_vec, b_vec)
    return out[:, :l]


def _reference_math(x, gamma, beta, scale, shift, groups, eps):
    """Pure-jnp forward (used by the backward recompute and as test oracle)."""
    b, l, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, l, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xhat = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, l, c)
    y = xhat * gamma[None, None, :] + beta[None, None, :]
    z = y * (scale[:, None, :].astype(jnp.float32) + 1.0) + shift[
        :, None, :
    ].astype(jnp.float32)
    return z * jax.nn.sigmoid(z)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def groupnorm_film_silu(
    x: jnp.ndarray,      # (B, L, C)
    gamma: jnp.ndarray,  # (C,)
    beta: jnp.ndarray,   # (C,)
    scale: jnp.ndarray,  # (B, C)
    shift: jnp.ndarray,  # (B, C)
    groups: int = 8,
    eps: float = 1e-5,
    block_l: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    return _fwd_impl(x, gamma, beta, scale, shift, groups, eps, block_l, interpret)


def _vjp_fwd(x, gamma, beta, scale, shift, groups, eps, block_l, interpret):
    out = _fwd_impl(x, gamma, beta, scale, shift, groups, eps, block_l, interpret)
    return out, (x, gamma, beta, scale, shift)


def _vjp_bwd(groups, eps, block_l, interpret, residuals, g):
    """Recompute-statistics backward (pure XLA; differentiates the
    reference math — numerically identical fn, grads exact)."""
    x, gamma, beta, scale, shift = residuals

    def f(x_, gamma_, beta_, scale_, shift_):
        return _reference_math(x_, gamma_, beta_, scale_, shift_, groups, eps)

    _, vjp = jax.vjp(f, x, gamma, beta, scale, shift)
    dx, dgamma, dbeta, dscale, dshift = vjp(g.astype(jnp.float32))
    return (
        dx.astype(x.dtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
        dscale.astype(scale.dtype),
        dshift.astype(shift.dtype),
    )


groupnorm_film_silu.defvjp(_vjp_fwd, _vjp_bwd)
