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

Gradients: jax.custom_vjp with the backward ALSO in Pallas (round 2 —
the round-1 recompute-in-XLA backward measured 548 vs 304 ms in the train
step; the per-op profile showed GroupNorm f32 materialization + stats at
~80 ms of the 259 ms step). The backward streams (x, g) twice:

  phase 0: t1_c = sum_L dz, t2_c = sum_L dz*xhat   (dz recomputed from the
           saved per-channel mean/rstd broadcasts; silu'(z) elementwise)
  finalize: dA = t2, dB = t1; group sums fold through the SAME membership
           matmul as forward since dxhat = dz*A:
              S1_g = sum_{c in g} A_c t1_c,  S2_g = sum_{c in g} A_c t2_c
  phase 1: dx = rstd * (A*dz - (S1_g + xhat*S2_g) / N_g)

Param grads chain outside in XLA from the tiny (B, C) dA/dB:
  dgamma = sum_b dA*(scale+1), dbeta = sum_b dB*(scale+1),
  dscale = dA*gamma + dB*beta, dshift = dB.
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
    mean_o,   # (1, 1, C) f32 output: per-channel broadcast of group mean
    rstd_o,   # (1, 1, C) f32 output
    sum_s,    # (1, C) f32 scratch
    sq_s,     # (1, C) f32 scratch
    mean_s,   # (1, C) f32 scratch (per-channel broadcast of group mean)
    rstd_s,   # (1, C) f32 scratch
    *,
    groups: int,
    eps: float,
    seq_len: int,
    block_l: int,
    c_orig: int,
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
        # support lane reshapes like (1, C) -> (G, C/G) on real TPUs.
        # Lane j carries channel j % c_orig (L-rows may be lane-packed).
        c = sum_s.shape[1]
        cg_orig = c_orig // groups
        n_el = jnp.float32(seq_len * (c // groups))
        lane = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
        chan_group = (lane % c_orig) // cg_orig
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
        mean_o[0] = mean_s[:]  # saved for the Pallas backward
        rstd_o[0] = rstd_s[:]

    @pl.when(p == 1)
    def _normalize():
        x = x_ref[0].astype(jnp.float32)
        y = (x - mean_s[:]) * rstd_s[:]
        y = y * a_ref[0] + b_ref[0]
        o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


def _pack_factor(c: int, l: int) -> int:
    """Fold f consecutive L-rows into lanes so the lane dim is >=128 —
    C=64 stages otherwise run the whole kernel at half VPU width (the same
    lane-padding tax the convs pay). (B, L, C) -> (B, L/f, C*f) is a
    contiguous reshape: zero-cost relayout."""
    f = 1
    while c * f < 128 and l % (f * 2) == 0:
        f *= 2
    return f


def _fwd_impl(x, gamma, beta, scale, shift, groups, eps, block_l, interpret):
    b, l, c = x.shape
    f = _pack_factor(c, l)
    lp, cp = l // f, c * f
    xp = x.reshape(b, lp, cp)
    bl = min(block_l, lp) if lp >= 8 else lp
    if bl >= 8:
        bl -= bl % 8  # sublane-align the block for the real-TPU tiling
    l_pad = (lp + bl - 1) // bl * bl
    if l_pad != lp:
        xp = jnp.pad(xp, ((0, 0), (0, l_pad - lp), (0, 0)))
    n_l = l_pad // bl

    # fold GN affine + FiLM into two per-batch channel vectors (module doc)
    a_vec, b_vec = _fold_ab(gamma, beta, scale, shift)
    if f > 1:
        a_vec = jnp.tile(a_vec, (1, 1, f))
        b_vec = jnp.tile(b_vec, (1, 1, f))

    out, mean, rstd = pl.pallas_call(
        functools.partial(
            _kernel, groups=groups, eps=eps, seq_len=lp, block_l=bl, c_orig=c
        ),
        grid=(b, 2, n_l),
        in_specs=[
            pl.BlockSpec((1, bl, cp), lambda bi, p, li: (bi, li, 0)),
            pl.BlockSpec((1, 1, cp), lambda bi, p, li: (bi, 0, 0)),
            pl.BlockSpec((1, 1, cp), lambda bi, p, li: (bi, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, bl, cp), lambda bi, p, li: (bi, li, 0)),
            pl.BlockSpec((1, 1, cp), lambda bi, p, li: (bi, 0, 0)),
            pl.BlockSpec((1, 1, cp), lambda bi, p, li: (bi, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, l_pad, cp), x.dtype),
            jax.ShapeDtypeStruct((b, 1, cp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, cp), jnp.float32),
            pltpu.VMEM((1, cp), jnp.float32),
            pltpu.VMEM((1, cp), jnp.float32),
            pltpu.VMEM((1, cp), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # batch rows independent; phase+L sweep carry scratch state
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, a_vec, b_vec)
    return out[:, :lp].reshape(b, l, c), mean, rstd


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


# --------------------------------------------------------------------- #
# backward kernel (module docstring: two streamed passes + group fold)
# --------------------------------------------------------------------- #
def _bwd_kernel(
    x_ref,     # (1, BL, C) raw input
    g_ref,     # (1, BL, C) cotangent
    a_ref,     # (1, 1, C) f32: A = gamma*(scale+1)
    b_ref,     # (1, 1, C) f32: B = beta*(scale+1)+shift
    mean_ref,  # (1, 1, C) f32 saved stats (per-channel broadcast)
    rstd_ref,  # (1, 1, C) f32
    dx_ref,    # (1, BL, C) output
    da_ref,    # (1, 1, C) f32 output: sum_L dz*xhat
    db_ref,    # (1, 1, C) f32 output: sum_L dz
    t1_s,      # (1, C) f32 scratch
    t2_s,      # (1, C) f32 scratch
    s1_s,      # (1, C) f32 scratch: group-sum broadcast of A*t1
    s2_s,      # (1, C) f32 scratch: group-sum broadcast of A*t2
    *,
    groups: int,
    seq_len: int,
    block_l: int,
    c_orig: int,
):
    p = pl.program_id(1)
    li = pl.program_id(2)
    n_l = pl.num_programs(2)

    def dz_and_xhat(x):
        xhat = (x - mean_ref[0]) * rstd_ref[0]
        z = xhat * a_ref[0] + b_ref[0]
        sig = jax.nn.sigmoid(z)
        dsilu = sig * (1.0 + z * (1.0 - sig))
        g = g_ref[0].astype(jnp.float32)
        return g * dsilu, xhat

    @pl.when((p == 0) & (li == 0))
    def _init():
        t1_s[:] = jnp.zeros_like(t1_s)
        t2_s[:] = jnp.zeros_like(t2_s)

    @pl.when(p == 0)
    def _accumulate():
        x = x_ref[0].astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) + li * block_l
        valid = (row < seq_len).astype(jnp.float32)
        dz, xhat = dz_and_xhat(x)
        dz = dz * valid
        t1_s[:] = t1_s[:] + jnp.sum(dz, axis=0, keepdims=True)
        t2_s[:] = t2_s[:] + jnp.sum(dz * xhat, axis=0, keepdims=True)

    @pl.when((p == 0) & (li == n_l - 1))
    def _finalize():
        c = t1_s.shape[1]
        cg_orig = c_orig // groups
        n_el = jnp.float32(seq_len * (c // groups))
        lane = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
        chan_group = (lane % c_orig) // cg_orig
        group_id = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
        member = (chan_group == group_id).astype(jnp.float32)  # (C, G)
        dot = lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        da_ref[0] = t2_s[:]
        db_ref[0] = t1_s[:]
        # dxhat = dz*A  =>  group sums of dxhat / dxhat*xhat fold through A
        s1_s[:] = dot(dot(a_ref[0] * t1_s[:], member), member.T) / n_el
        s2_s[:] = dot(dot(a_ref[0] * t2_s[:], member), member.T) / n_el

    @pl.when(p == 1)
    def _dx():
        x = x_ref[0].astype(jnp.float32)
        dz, xhat = dz_and_xhat(x)
        dx = rstd_ref[0] * (a_ref[0] * dz - s1_s[:] - xhat * s2_s[:])
        dx_ref[0] = dx.astype(dx_ref.dtype)


def _bwd_impl(x, g, a_vec, b_vec, mean, rstd, groups, block_l, interpret):
    b, l, c = x.shape
    f = _pack_factor(c, l)  # same factor the forward used (saved stats match)
    lp, cp = l // f, c * f
    xp = x.reshape(b, lp, cp)
    gp = g.reshape(b, lp, cp)
    if f > 1:
        a_vec = jnp.tile(a_vec, (1, 1, f))
        b_vec = jnp.tile(b_vec, (1, 1, f))
    bl = min(block_l, lp) if lp >= 8 else lp
    if bl >= 8:
        bl -= bl % 8  # sublane-align the block for the real-TPU tiling
    l_pad = (lp + bl - 1) // bl * bl
    if l_pad != lp:
        xp = jnp.pad(xp, ((0, 0), (0, l_pad - lp), (0, 0)))
        gp = jnp.pad(gp, ((0, 0), (0, l_pad - lp), (0, 0)))
    n_l = l_pad // bl

    row_spec = pl.BlockSpec((1, bl, cp), lambda bi, p, li: (bi, li, 0))
    vec_spec = pl.BlockSpec((1, 1, cp), lambda bi, p, li: (bi, 0, 0))
    dx, da, db = pl.pallas_call(
        functools.partial(
            _bwd_kernel, groups=groups, seq_len=lp, block_l=bl, c_orig=c
        ),
        grid=(b, 2, n_l),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=(row_spec, vec_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, l_pad, cp), x.dtype),
            jax.ShapeDtypeStruct((b, 1, cp), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, cp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, cp), jnp.float32) for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, gp, a_vec, b_vec, mean, rstd)
    dx = dx[:, :lp].reshape(b, l, c)
    # fold the f lane-copies of each channel back together
    da = da[:, 0].reshape(b, f, c).sum(axis=1)
    db = db[:, 0].reshape(b, f, c).sum(axis=1)
    return dx, da, db


def _fold_ab(gamma, beta, scale, shift):
    g32 = gamma.astype(jnp.float32)[None, :]
    b32 = beta.astype(jnp.float32)[None, :]
    s32 = scale.astype(jnp.float32)
    t32 = shift.astype(jnp.float32)
    a_vec = (g32 * (s32 + 1.0))[:, None, :]  # (B, 1, C)
    b_vec = (b32 * (s32 + 1.0) + t32)[:, None, :]
    return a_vec, b_vec


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
    out, _, _ = _fwd_impl(x, gamma, beta, scale, shift, groups, eps, block_l, interpret)
    return out


def _vjp_fwd(x, gamma, beta, scale, shift, groups, eps, block_l, interpret):
    out, mean, rstd = _fwd_impl(
        x, gamma, beta, scale, shift, groups, eps, block_l, interpret
    )
    return out, (x, gamma, beta, scale, shift, mean, rstd)


def _vjp_bwd(groups, eps, block_l, interpret, residuals, g):
    """Pallas streaming backward (module docstring); tiny param-grad chain
    from the per-(b,c) dA/dB in XLA."""
    x, gamma, beta, scale, shift, mean, rstd = residuals
    a_vec, b_vec = _fold_ab(gamma, beta, scale, shift)
    dx, da, db = _bwd_impl(
        x, g, a_vec, b_vec, mean, rstd, groups, block_l, interpret
    )
    s1 = scale.astype(jnp.float32) + 1.0
    dgamma = jnp.sum(da * s1, axis=0)
    dbeta = jnp.sum(db * s1, axis=0)
    dscale = da * gamma.astype(jnp.float32)[None, :] + db * beta.astype(
        jnp.float32
    )[None, :]
    dshift = db
    return (
        dx.astype(x.dtype),
        dgamma.astype(gamma.dtype),
        dbeta.astype(beta.dtype),
        dscale.astype(scale.dtype),
        dshift.astype(shift.dtype),
    )


groupnorm_film_silu.defvjp(_vjp_fwd, _vjp_bwd)
