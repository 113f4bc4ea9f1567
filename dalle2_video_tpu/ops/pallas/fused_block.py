"""Fused Block3D megakernel: packed conv3x3 + bias + GroupNorm + FiLM + SiLU.

The round-2 per-op profile (docs/PERF.md) showed the bench train step is NOT
conv-bound: of the 259 ms device step, convolutions are 35 ms while
GroupNorm statistics + f32 GN fusions are ~80 ms and pure layout copies
(conv batch-in-lanes <-> channel-minor relayouts at every kernel seam) are
43 ms. Single-op Pallas substitutions all LOST because each pallas_call
boundary re-exposed the layout seam (GN kernel: 335.6 vs 268.8 ms). This
module fuses the whole Block3D body (reference dalle2_video.py:99-133:
conv(1,3,3) -> GroupNorm(8) -> FiLM -> SiLU) so the seams disappear:

  1. Pallas kernel: pixel-pair-packed 3x3 conv (ops/pallas/spatial_conv.py
     formulation: one (H*Wp, 12C) x (12C, 2Co) MXU matmul per frame at full
     lane width even for C=64) + bias, with the GroupNorm sum / sum-of-
     squares ACCUMULATED IN THE EPILOGUE over the (T, H, W) sweep of each
     batch row — the statistics pass that cost ~40 ms/step is now free.
     The H halo is built in VMEM scratch (the standalone conv kernel paid a
     full HBM jnp.pad round-trip per call).
  2. XLA glue on (B, 2Co) vectors: stats -> mean/rstd -> fold GN affine +
     FiLM + mean into one per-lane affine  A'' = rstd*gamma*(scale+1),
     B'' = beta*(scale+1)+shift - mean*A''.
  3. XLA elementwise on the PACKED (B, R, 2Co) view: silu(y*A'' + B'') —
     full 128-lane occupancy even at Co=64, and XLA fuses it into one pass.

Backward (custom_vjp, residuals = packed input, conv output, tiny stats):
  * GN/FiLM/SiLU backward reuses groupnorm_film._bwd_kernel — its
    membership-matrix group fold already handles lane-packed layouts via
    c_orig (lane j carries channel j % Co) — streaming (y, g) twice with
    no f32 materialization; emits per-lane dA/dB accumulators.
  * d(conv) reuses the packed transposed-conv + wgrad kernels from
    spatial_conv (dx = same kernel with flipped/transposed B).
  * dbias needs NO extra pass: sum_l dx is closed-form from the kernels'
    own accumulators (t1, t2 group-folds + forward per-lane sums):
      sum_l dx = rstd*(A*t1 - R*S1 - S2*sum_l xhat),
      sum_l xhat = rstd*(s - R*mean).

Layout notes: (B,T,H,W,C) -> packed (B*T, H, W/2, 2C) is a contiguous
reshape (zero-cost); the only requirements are W even, H,W >= kernel
support, and Co % groups == 0. Lanes are full once 2C >= 128.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dalle2_video_tpu.ops.pallas.spatial_conv import (
    _build_a,
    _conv_packed_raw,
    _pick_bh,
    _wgrad_packed,
    pack_kernel_matrix,
    pack_width,
    unpack_kernel_grad,
    unpack_width,
)
from dalle2_video_tpu.ops.pallas.groupnorm_film import _bwd_kernel


# --------------------------------------------------------------------- #
# forward kernel: conv + bias + stats epilogue
# --------------------------------------------------------------------- #
def _conv_stats_kernel(
    x_ref,     # (1, H, Wp, 2C) packed input frame (no HBM halo)
    b_ref,     # (12C, 2Co) packed kernel matrix
    bias_ref,  # (1, 2Co) f32 packed bias
    o_ref,     # (1, H, Wp, 2Co) packed conv output
    s_ref,     # (1, 1, 2Co) f32 per-batch-row sum output
    ss_ref,    # (1, 1, 2Co) f32 per-batch-row sum-of-squares output
    xpad,      # VMEM (H+2, Wp, 2C) scratch: H-halo built on-chip
    s_acc,     # VMEM (1, 2Co) f32
    ss_acc,    # VMEM (1, 2Co) f32
    *,
    h: int,
    wp: int,
    c: int,
    bh: int,
    n_t: int,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        s_acc[:] = jnp.zeros_like(s_acc)
        ss_acc[:] = jnp.zeros_like(ss_acc)

    # halo in VMEM: zero edge rows, body copied once (vs a full-tensor
    # HBM pad round-trip in the standalone conv kernel)
    zero_row = jnp.zeros((1, wp, 2 * c), x_ref.dtype)
    xpad[pl.ds(0, 1)] = zero_row
    xpad[pl.ds(h + 1, 1)] = zero_row
    xpad[pl.ds(1, h)] = x_ref[0]

    co2 = b_ref.shape[1]
    bias = bias_ref[0].astype(jnp.float32)  # (2Co,)

    def body(k, carry):
        s_part, ss_part = carry
        xp_blk = xpad[pl.ds(k * bh, bh + 2)]  # (bh+2, Wp, 2C)
        a = _build_a(xp_blk, bh, wp, c)  # (bh*Wp, 12C)
        y = jnp.dot(a, b_ref[:], preferred_element_type=jnp.float32)
        y = y + bias[None, :]
        o_ref[0, pl.ds(k * bh, bh)] = y.reshape(bh, wp, co2).astype(o_ref.dtype)
        s_part = s_part + jnp.sum(y, axis=0, keepdims=True)
        ss_part = ss_part + jnp.sum(y * y, axis=0, keepdims=True)
        return s_part, ss_part

    zeros = jnp.zeros((1, co2), jnp.float32)
    s_part, ss_part = jax.lax.fori_loop(0, h // bh, body, (zeros, zeros))
    s_acc[:] = s_acc[:] + s_part
    ss_acc[:] = ss_acc[:] + ss_part

    @pl.when(t == n_t - 1)
    def _emit():
        s_ref[0] = s_acc[:]
        ss_ref[0] = ss_acc[:]


def _conv_bias_stats(xp, bmat, bias2, b, n_t, interpret=False):
    """xp (B*T, H, Wp, 2C), bmat (12C, 2Co), bias2 (1, 2Co) f32 ->
    (yp (B*T, H, Wp, 2Co), s (B, 1, 2Co) f32, ss (B, 1, 2Co) f32)."""
    bt, h, wp, c2 = xp.shape
    c = c2 // 2
    co2 = bmat.shape[1]
    return pl.pallas_call(
        functools.partial(
            _conv_stats_kernel, h=h, wp=wp, c=c, bh=_pick_bh(h), n_t=n_t
        ),
        grid=(b, n_t),
        in_specs=[
            pl.BlockSpec((1, h, wp, c2), lambda bi, ti: (bi * n_t + ti, 0, 0, 0)),
            pl.BlockSpec((12 * c, co2), lambda bi, ti: (0, 0)),
            pl.BlockSpec((1, co2), lambda bi, ti: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, h, wp, co2), lambda bi, ti: (bi * n_t + ti, 0, 0, 0)),
            pl.BlockSpec((1, 1, co2), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, 1, co2), lambda bi, ti: (bi, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bt, h, wp, co2), xp.dtype),
            jax.ShapeDtypeStruct((b, 1, co2), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, co2), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((h + 2, wp, c2), xp.dtype),
            pltpu.VMEM((1, co2), jnp.float32),
            pltpu.VMEM((1, co2), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # T sweep carries the stats scratch; batch rows independent
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, bmat, bias2)


# --------------------------------------------------------------------- #
# glue math (all on tiny (B, 2Co) vectors)
# --------------------------------------------------------------------- #
def _lane_membership(co: int, groups: int) -> jnp.ndarray:
    """(2Co, G) 0/1 matrix: lane j belongs to group (j % Co) // (Co/G)."""
    cg = co // groups
    lane = jnp.arange(2 * co)
    return (
        ((lane % co) // cg)[:, None] == jnp.arange(groups)[None, :]
    ).astype(jnp.float32)


def _stats_to_mean_rstd(s, ss, co, groups, n_g, eps):
    """Per-lane broadcasts of group mean/rstd from per-lane sums.
    s, ss: (B, 1, 2Co) f32; n_g = elements per group = T*H*W*Cg."""
    member = _lane_membership(co, groups)  # (2Co, G)
    g_sum = jnp.einsum("blc,cg->blg", s, member)
    g_sq = jnp.einsum("blc,cg->blg", ss, member)
    mean = g_sum / n_g
    var = g_sq / n_g - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_l = jnp.einsum("blg,cg->blc", mean, member)
    rstd_l = jnp.einsum("blg,cg->blc", rstd, member)
    return mean_l, rstd_l


def _fold_ab_lanes(gamma, beta, scale, shift):
    """A = gamma*(scale+1), B = beta*(scale+1)+shift, tiled to packed lanes.
    Returns (B, 1, 2Co) f32 each."""
    g32 = gamma.astype(jnp.float32)[None, :]
    b32 = beta.astype(jnp.float32)[None, :]
    s32 = scale.astype(jnp.float32) + 1.0
    t32 = shift.astype(jnp.float32)
    a = (g32 * s32)[:, None, :]
    b = (b32 * s32 + t32)[:, None, :]
    return jnp.tile(a, (1, 1, 2)), jnp.tile(b, (1, 1, 2))


# --------------------------------------------------------------------- #
# backward scaffolding (reuses groupnorm_film._bwd_kernel, c_orig=Co)
# --------------------------------------------------------------------- #
def _gn_bwd_packed(y, g, a_vec, b_vec, mean, rstd, groups, co, interpret):
    """y, g: (B, R, 2Co) packed; vectors (B, 1, 2Co) f32.
    Returns (dy_conv (B, R, 2Co), da (B,1,2Co) f32, db (B,1,2Co) f32)."""
    b, r, c2 = y.shape
    bl = min(1024, r)
    if bl >= 8:
        bl -= bl % 8
    r_pad = (r + bl - 1) // bl * bl
    yp, gp = y, g
    if r_pad != r:
        yp = jnp.pad(y, ((0, 0), (0, r_pad - r), (0, 0)))
        gp = jnp.pad(g, ((0, 0), (0, r_pad - r), (0, 0)))
    n_l = r_pad // bl
    row_spec = pl.BlockSpec((1, bl, c2), lambda bi, p, li: (bi, li, 0))
    vec_spec = pl.BlockSpec((1, 1, c2), lambda bi, p, li: (bi, 0, 0))
    dx, da, db = pl.pallas_call(
        functools.partial(
            _bwd_kernel, groups=groups, seq_len=r, block_l=bl, c_orig=co
        ),
        grid=(b, 2, n_l),
        in_specs=[row_spec, row_spec, vec_spec, vec_spec, vec_spec, vec_spec],
        out_specs=(row_spec, vec_spec, vec_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, r_pad, c2), y.dtype),
            jax.ShapeDtypeStruct((b, 1, c2), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c2), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((1, c2), jnp.float32) for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(yp, gp, a_vec, b_vec, mean, rstd)
    return dx[:, :r], da, db


# --------------------------------------------------------------------- #
# public op
# --------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def fused_block3d(
    x: jnp.ndarray,      # (B, T, H, W, C)
    w: jnp.ndarray,      # (3, 3, C, Co) HWIO
    bias: jnp.ndarray,   # (Co,)
    gamma: jnp.ndarray,  # (Co,)
    beta: jnp.ndarray,   # (Co,)
    scale: jnp.ndarray,  # (B, Co) FiLM scale (pass zeros when absent)
    shift: jnp.ndarray,  # (B, Co) FiLM shift
    groups: int = 8,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    out, _ = _fwd_impl(x, w, bias, gamma, beta, scale, shift, groups, eps, interpret)
    return out


def _fwd_impl(x, w, bias, gamma, beta, scale, shift, groups, eps, interpret):
    b, t, h, wd, c = x.shape
    co = w.shape[3]
    xp = pack_width(x.reshape(b * t, h, wd, c))  # free reshape
    bmat = pack_kernel_matrix(w.astype(x.dtype))
    bias2 = jnp.tile(bias.astype(jnp.float32)[None, :], (1, 2))
    yp, s, ss = _conv_bias_stats(xp, bmat, bias2, b, t, interpret)

    n_g = jnp.float32(t * h * wd * (co // groups))  # elements per group
    mean_l, rstd_l = _stats_to_mean_rstd(s, ss, co, groups, n_g, eps)
    a_vec, b_vec = _fold_ab_lanes(gamma, beta, scale, shift)
    # fold mean into the affine: z = (y-mean)*rstd*A + B = y*A2 + B2
    a2 = rstd_l * a_vec
    b2 = b_vec - mean_l * a2

    wp = wd // 2
    y_rows = yp.reshape(b, t * h * wp, 2 * co)
    z = y_rows.astype(jnp.float32) * a2 + b2  # XLA fuses this single pass
    out = (z * jax.nn.sigmoid(z)).astype(x.dtype)
    out = unpack_width(out.reshape(b * t, h, wp, 2 * co)).reshape(b, t, h, wd, co)
    residuals = (xp, w, gamma, beta, scale, shift, yp, s, mean_l, rstd_l)
    return out, residuals


def _vjp_fwd(x, w, bias, gamma, beta, scale, shift, groups, eps, interpret):
    out, residuals = _fwd_impl(
        x, w, bias, gamma, beta, scale, shift, groups, eps, interpret
    )
    return out, residuals


def _vjp_bwd(groups, eps, interpret, residuals, g):
    xp, w, gamma, beta, scale, shift, yp, s, mean_l, rstd_l = residuals
    bt, hh, wp, c2 = xp.shape
    co2 = yp.shape[3]
    co = co2 // 2
    c = c2 // 2
    b = s.shape[0]
    t = bt // b
    r = t * hh * wp

    # ---- GN+FiLM+SiLU backward: streaming Pallas kernel on packed rows ----
    a_vec, b_vec = _fold_ab_lanes(gamma, beta, scale, shift)
    y_rows = yp.reshape(b, r, co2)
    g_rows = pack_width(
        g.reshape(bt, hh, wp * 2, co)
    ).reshape(b, r, co2)
    dy_rows, da, db = _gn_bwd_packed(
        y_rows, g_rows, a_vec, b_vec, mean_l, rstd_l, groups, co, interpret
    )

    # ---- param grads from the tiny per-lane accumulators ----
    def fold(v):  # (B, 1, 2Co) -> (B, Co): sum the two pixel-pair lanes
        return v[:, 0].reshape(b, 2, co).sum(axis=1)

    da_c, db_c = fold(da), fold(db)
    s1 = scale.astype(jnp.float32) + 1.0
    dgamma = jnp.sum(da_c * s1, axis=0)
    dbeta = jnp.sum(db_c * s1, axis=0)
    dscale = da_c * gamma.astype(jnp.float32)[None, :] + db_c * beta.astype(
        jnp.float32
    )[None, :]
    dshift = db_c

    # ---- dbias: closed form, no extra pass (module docstring) ----
    member = _lane_membership(co, groups)  # (2Co, G)
    n_g = jnp.float32(r * co2 // groups)
    gdot = lambda v: jnp.einsum(
        "blc,cg->blg", v, member
    )  # group sums over lanes
    bcast = lambda v: jnp.einsum("blg,cg->blc", v, member)
    s1_l = bcast(gdot(a_vec * db)) / n_g  # S1 per lane (B,1,2Co)
    s2_l = bcast(gdot(a_vec * da)) / n_g
    sum_xhat = rstd_l * (s - jnp.float32(r) * mean_l)
    sum_dy = rstd_l * (
        a_vec * db - jnp.float32(r) * s1_l - s2_l * sum_xhat
    )  # (B, 1, 2Co)
    dbias = jnp.sum(sum_dy[:, 0].reshape(b, 2, co), axis=(0, 1))

    # ---- conv backward: packed transposed-conv + wgrad kernels ----
    dyp = dy_rows.reshape(bt, hh, wp, co2)
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,Co,C)
    bmat_t = pack_kernel_matrix(w_t.astype(dyp.dtype))
    dxp = _conv_packed_raw(dyp, bmat_t, interpret)
    dmat = _wgrad_packed(xp, dyp, interpret)
    dw = unpack_kernel_grad(dmat, c, co).astype(w.dtype)

    dx = unpack_width(dxp).reshape(b, t, hh, wp * 2, c)
    return (
        dx.astype(xp.dtype),
        dw,
        dbias.astype(jnp.float32),
        dgamma.astype(jnp.float32),
        dbeta.astype(jnp.float32),
        dscale.astype(scale.dtype),
        dshift.astype(shift.dtype),
    )


fused_block3d.defvjp(_vjp_fwd, _vjp_bwd)
