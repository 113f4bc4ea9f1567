"""Packed-lane spatial 3x3 convolution — the stage-0 lane-padding fix.

Every conv in the reference's Unet3D is space-only (1,3,3) (reference
dalle2_video.py:107,214-215,331). At the flagship config the dominant
full-resolution stages run at C=64: a (8,128)-tiled TPU wastes half of
every load/store and MXU pass on lane padding (measured 56 vs 88 TF/s for
C=64 vs C=128 — docs/PERF.md). This kernel removes the tax by keeping the
tensor in a PACKED layout (N, H, W/2, 2C): two horizontally adjacent pixels
share a 128-wide lane vector.

Formulation (per grid cell = one (n) frame-slice):
    A[(h, m), (dh, j, c)] = x[h + dh - 1, 2m + j - 1, c]   (zeros at edges)
    B[(dh, j, c), (p, co)] = w[dh, j - p, c, co]           (0 <= j - p <= 2)
    Y[(h, m), (p, co)]    = A @ B                          == y[h, 2m+p, co]

A is built in VMEM from 12 shifted lane-slices (sublane rolls + 64-aligned
lane slices only — Mosaic-safe), so the MXU sees ONE (H*W/2, 768) x
(768, 128) matmul per cell: K and N both full-width. Dense-vs-semantic
overhead is 4/3 (the j-padding zeros), for a ~148 TF/s semantic ceiling vs
98 TF/s for the lane-padded direct form.

Backward: dx is the transposed conv == the same kernel with a flipped-and-
transposed B; dW reuses the A construction in a wgrad kernel that reduces
A^T @ dY over the grid. Exposed as a custom_vjp.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# --------------------------------------------------------------------- #
# layout helpers (XLA side)
# --------------------------------------------------------------------- #
def pack_width(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H, W//2, 2C): adjacent w-pixel pair into lanes."""
    n, h, w, c = x.shape
    assert w % 2 == 0
    return x.reshape(n, h, w // 2, 2 * c)


def unpack_width(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W/2, 2C) -> (N, H, W, C)."""
    n, h, wp, c2 = x.shape
    return x.reshape(n, h, wp * 2, c2 // 2)


def pack_kernel_matrix(w: jnp.ndarray) -> jnp.ndarray:
    """w (3, 3, C, Co) -> B (3*4*C, 2*Co) with B[(dh,j,c),(p,co)] =
    w[dh, j-p, c, co] (zero where j-p outside [0,3))."""
    kh, kw, c, co = w.shape
    assert (kh, kw) == (3, 3)
    b = jnp.zeros((3, 4, c, 2, co), w.dtype)
    b = b.at[:, 0:3, :, 0, :].set(w)  # p=0: j = 0..2
    b = b.at[:, 1:4, :, 1, :].set(w)  # p=1: j = 1..3
    return b.reshape(3 * 4 * c, 2 * co)


def unpack_kernel_grad(db: jnp.ndarray, c: int, co: int) -> jnp.ndarray:
    """Adjoint of pack_kernel_matrix: dB (12C, 2Co) -> dw (3, 3, C, Co)."""
    db = db.reshape(3, 4, c, 2, co)
    return db[:, 0:3, :, 0, :] + db[:, 1:4, :, 1, :]


# --------------------------------------------------------------------- #
# forward kernel
# --------------------------------------------------------------------- #
def _shift_wp(xr: jnp.ndarray, direction: int) -> jnp.ndarray:
    """Shift a (H, Wp, 2C) f32 block one step along Wp with zero fill.
    direction=+1 brings neighbor m-1 into slot m; -1 brings m+1.
    NOTE: Mosaic's rotate only supports 32-bit data ("Rotate with
    non-32-bit data" rejection) — callers pass f32."""
    h, wp, c2 = xr.shape
    shift = 1 if direction == 1 else wp - 1  # pltpu.roll wants shift >= 0
    rolled = pltpu.roll(xr, shift, 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (h, wp, c2), 1)
    edge = 0 if direction == 1 else wp - 1
    return jnp.where(idx == edge, jnp.zeros_like(rolled), rolled)


def _build_a(xp: jnp.ndarray, h: int, wp: int, c: int) -> jnp.ndarray:
    """xp (H+2, Wp, 2C) zero-padded in H -> A (H*Wp, 12C) in xp's dtype."""
    dtype = xp.dtype
    parts = []
    for dh in range(3):
        xr = jax.lax.slice_in_dim(xp, dh, dh + h, axis=0)  # (H, Wp, 2C)
        xr32 = xr.astype(jnp.float32)  # rolls need 32-bit lanes (see above)
        left = _shift_wp(xr32, 1)
        right = _shift_wp(xr32, -1)
        # j = 0..3 <-> original w offsets -1..2 for the pixel pair
        parts += [left[..., c:], xr32[..., :c], xr32[..., c:], right[..., :c]]
    a = jnp.concatenate(parts, axis=-1)  # (H, Wp, 12C) f32
    return a.reshape(h * wp, 12 * c).astype(dtype)


def _conv_fwd_kernel(xp_ref, b_ref, o_ref, *, h: int, wp: int, c: int, bh: int):
    co2 = b_ref.shape[1]

    def body(k, _):
        xp_blk = xp_ref[0, pl.ds(k * bh, bh + 2)]  # (BH+2, Wp, 2C) w/ halo
        a = _build_a(xp_blk, bh, wp, c)  # (BH*Wp, 12C)
        y = jnp.dot(a, b_ref[:], preferred_element_type=jnp.float32)
        o_ref[0, pl.ds(k * bh, bh)] = y.reshape(bh, wp, co2).astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, h // bh, body, 0)


def _pick_bh(h: int) -> int:
    for bh in (8, 4, 2, 1):
        if h % bh == 0:
            return bh
    return 1


def _conv_packed_raw(xp: jnp.ndarray, bmat: jnp.ndarray, interpret: bool = False):
    """xp (N, H, Wp, 2C) packed input, bmat (12C, 2Co) -> (N, H, Wp, 2Co)."""
    n, h, wp, c2 = xp.shape
    c = c2 // 2
    co2 = bmat.shape[1]
    xp_pad = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return pl.pallas_call(
        functools.partial(_conv_fwd_kernel, h=h, wp=wp, c=c, bh=_pick_bh(h)),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, wp, c2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((12 * c, co2), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, wp, co2), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, wp, co2), xp.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(xp_pad, bmat)


# --------------------------------------------------------------------- #
# wgrad kernel: dB = sum_n A_n^T @ dY_n
# --------------------------------------------------------------------- #
def _wgrad_kernel(xp_ref, dy_ref, db_ref, acc, *, h: int, wp: int, c: int, bh: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    co2 = dy_ref.shape[3]

    def body(k, _):
        xp_blk = xp_ref[0, pl.ds(k * bh, bh + 2)]
        a = _build_a(xp_blk, bh, wp, c)  # (BH*Wp, 12C)
        dy = dy_ref[0, pl.ds(k * bh, bh)].reshape(bh * wp, co2).astype(a.dtype)
        acc[:] = acc[:] + jax.lax.dot_general(
            a, dy, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, h // bh, body, 0)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        db_ref[:] = acc[:]


def _wgrad_packed(xp: jnp.ndarray, dy: jnp.ndarray, interpret: bool = False):
    """dB (12C, 2Co) from packed input + packed cotangent."""
    n, h, wp, c2 = xp.shape
    c = c2 // 2
    co2 = dy.shape[3]
    xp_pad = jnp.pad(xp, ((0, 0), (1, 1), (0, 0), (0, 0)))
    return pl.pallas_call(
        functools.partial(_wgrad_kernel, h=h, wp=wp, c=c, bh=_pick_bh(h)),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h + 2, wp, c2), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, wp, co2), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((12 * c, co2), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((12 * c, co2), jnp.float32),
        scratch_shapes=[pltpu.VMEM((12 * c, co2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xp_pad, dy)


# --------------------------------------------------------------------- #
# public op with custom VJP (operates on PACKED layout)
# --------------------------------------------------------------------- #
@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_packed(xp: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """3x3 SAME stride-1 spatial conv on packed (N, H, W/2, 2C) layout.

    w is the ordinary (3, 3, C, Co) HWIO kernel; output is packed
    (N, H, W/2, 2Co). Equivalent to lax.conv_general_dilated on the
    unpacked layout (tested to bf16 tolerance).
    """
    bmat = pack_kernel_matrix(w.astype(xp.dtype))
    return _conv_packed_raw(xp, bmat, interpret)


def _conv_vjp_fwd(xp, w, interpret):
    return conv3x3_packed(xp, w, interpret), (xp, w)


def _conv_vjp_bwd(interpret, res, g):
    xp, w = res
    c = w.shape[2]
    co = w.shape[3]
    # dx: transposed conv == conv of g with w flipped in (kh, kw) and
    # (ci, co) swapped — same packed kernel, different B
    w_t = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)  # (3,3,Co,C)
    bmat_t = pack_kernel_matrix(w_t.astype(g.dtype))
    dx = _conv_packed_raw(g, bmat_t, interpret)
    # dw: wgrad kernel then fold the packed structure back
    db = _wgrad_packed(xp, g, interpret)
    dw = unpack_kernel_grad(db, c, co).astype(w.dtype)
    return dx.astype(xp.dtype), dw


conv3x3_packed.defvjp(_conv_vjp_fwd, _conv_vjp_bwd)


def conv3x3_spatial(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """Unpacked-layout convenience wrapper: (N, H, W, C) in/out."""
    return unpack_width(conv3x3_packed(pack_width(x), w, interpret))


# --------------------------------------------------------------------- #
# hybrid: Pallas forward, XLA backward
# --------------------------------------------------------------------- #
# Measured (docs/PERF.md round-2 conv microbenches): the packed Pallas
# forward beats XLA 2x at small-spatial/high-C geometries (43.7 vs 21.7
# TF/s at 8x8/C=512, halo-dominated XLA fwd), but XLA's conv VJP runs at
# 146 TF/s there — 3x faster than the Pallas dx/wgrad kernels. So the
# production variant keeps the Pallas forward and routes the backward
# through jax.vjp of the equivalent XLA conv.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3_packed_xbwd(xp: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    return conv3x3_packed(xp, w, interpret)


def _xbwd_fwd(xp, w, interpret):
    return conv3x3_packed(xp, w, interpret), (xp, w)


def _xbwd_bwd(interpret, res, g):
    xp, w = res

    def ref_conv(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_.astype(x_.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, vjp = jax.vjp(ref_conv, unpack_width(xp), w)
    dx, dw = vjp(unpack_width(g).astype(xp.dtype))
    return pack_width(dx).astype(xp.dtype), dw.astype(w.dtype)


conv3x3_packed_xbwd.defvjp(_xbwd_fwd, _xbwd_bwd)


def conv3x3_spatial_xbwd(x: jnp.ndarray, w: jnp.ndarray, interpret: bool = False):
    """(N, H, W, C) in/out; Pallas fwd + XLA bwd."""
    return unpack_width(conv3x3_packed_xbwd(pack_width(x), w, interpret))
