"""Pallas flash attention for the joint t*h*w bottleneck (multi-query).

The decoder's only quadratic op is the joint space-time self-attention at the
bottleneck (reference dalle2_video.py:430-431, 542-558 via
RearrangeToSequence(Residual(Attention))): sequence length t*(h/8)*(w/8)
(23k tokens at the shipped 90x128x128 config). dalle2-pytorch's Attention is
multi-query — all q heads share one (k, v) head — so the kv stream is tiny
and the kernel is MXU-bound on q@k^T and p@v.

This kernel computes softmax(q k^T * scale) v in the streaming (online
softmax) fashion:
  * grid (batch, q_blocks, kv_blocks); kv innermost so the running
    (max, sum, acc) state lives in VMEM scratch across kv steps
  * q block (BLOCK_Q, dim) fused over heads: q heads are folded into the
    q-block axis, k/v blocks shared — exactly MQA's arithmetic
  * fp32 accumulation, bf16-friendly inputs

Fully differentiable, and the backward is ALSO a Pallas streaming pair of
kernels (dq; dk/dv) that recompute P tiles from the forward's saved row
logsumexp — this is the TRAINING path for long-context configs: at 23k
tokens XLA attention cannot compile at all (68 GB sim). Short contexts
keep XLA attention (its fusion wins there). Numerics validated against
the XLA reference in tests/test_pallas.py (interpret mode on CPU,
compiled on TPU in bench); block defaults tuned by probes 15/19/20 and
the r3 backward A/B (docs/PERF.md).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_mqa_kernel(
    q_ref,  # (BLOCK_Q, d) — q PRE-SCALED by sm_scale (saves a sim-size mul)
    k_ref,  # (inner_kv * BLOCK_K, d)
    v_ref,  # (inner_kv * BLOCK_K, 2d) — v then d MASKED-ONES cols (see below)
    *refs,
    d: int,
    save_lse: bool = False,
    use_exp2: bool = False,
    inner_kv: int = 1,
):
    # Fused softmax denominator (r3): v is extended with d extra columns
    # that are 1 for real kv rows and 0 for padded rows, so the p @ v_ext
    # dot accumulates [p@v | l, ..., l] in ONE MXU pass — at d=32 both
    # halves live inside the same 128-lane MXU tile, so the denominator
    # is free. This deletes the per-element VPU row-sum, the separate l
    # scratch updates, AND the kvmask multiply of the r2 kernel (padding
    # columns contribute zero to both halves through v_ext; the VPU work
    # per sim element drops to sub+exp+max — docs/PERF.md r3 fwd diet).
    # Padded kv columns carry REAL logits (k is edge-padded with copies of
    # the last real row), so they never dominate the running max and the
    # real columns' p is exact in every regime; their output/denominator
    # contribution is exactly zero through v_ext's zeroed rows.
    refs = list(refs)
    o_ref = refs.pop(0)
    lse_ref = refs.pop(0) if save_lse else None
    m_scratch, acc_scratch = refs
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]  # blocks carry a leading singleton batch dim
    # use_exp2: q was pre-scaled by an extra log2(e), so s/m live in the
    # base-2 logit domain and the softmax weights are exp2(s - m) — the VPU
    # skips exp's internal x*log2(e) multiply on every sim element
    # (exp(x) == exp2(x * log2(e)); docs/PERF.md r3 fwd diet #2)
    expf = jnp.exp2 if use_exp2 else jnp.exp

    # inner_kv > 1: the grid cell's DMA block holds inner_kv kv sub-tiles,
    # processed by an UNROLLED online-softmax loop. The (BLOCK_Q, BLOCK_K)
    # sim tile — the VMEM item that caps block growth (probe19) — stays at
    # sub-tile size while the per-grid-cell overhead (revolving-buffer
    # bookkeeping, scratch init/finalize predication, grid serialization
    # between cells — probe9's serial chain) is amortized over inner_kv x
    # the MXU work. k/v sub-slices are static sublane-dim ref slices
    # (Mosaic-safe; only LANE-offset slices are not — _finalize note).
    sub = k_ref.shape[1] // inner_kv
    for i in range(inner_kv):
        k = k_ref[0, i * sub:(i + 1) * sub, :]
        v = v_ref[0, i * sub:(i + 1) * sub, :]  # (sub, 2d) extended

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BLOCK_Q, sub)

        m_prev = m_scratch[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)

        p = expf(s - m_next)  # (BLOCK_Q, sub)
        alpha = expf(m_prev - m_next)

        # alpha rescale covers the l columns too — they ARE accumulator state
        acc = acc_scratch[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        m_scratch[:] = m_next
        acc_scratch[:] = acc

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        # columns [d:2d] all hold l — elementwise divide, no broadcast
        # (slice the loaded VALUE, not the ref: lane-offset ref slices
        # are not Mosaic-safe at d=32; value slices lower to vector ops)
        a = acc_scratch[:]
        o_ref[0] = (a[:, :d] / a[:, d:]).astype(o_ref.dtype)
        if save_lse:
            # logsumexp of the REAL columns (v_ext zeroed padded ones):
            # exp(s_i - lse) are the exact softmax probabilities — the bwd
            # kernels recompute P tiles from this row statistic. Emitted in
            # the NATURAL-log domain either way (m * ln2 converts base-2
            # running max back), so the backward kernels never change.
            m = m_scratch[:]
            if use_exp2:
                m = m * 0.6931471805599453  # ln 2
            lse_ref[0] = (m + jnp.log(a[:, d:]))[:, :1]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10)
)
def _flash_mqa_diff(q, k, v, sm_scale, block_q, block_k, interpret, bwd_impl,
                    bwd_block_q, bwd_block_k, inner_kv):
    return _flash_mqa_fwd_only(
        q, k, v, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        interpret=interpret, inner_kv=inner_kv,
    )


def _flash_mqa_vjp_fwd(q, k, v, sm_scale, block_q, block_k, interpret, bwd_impl,
                       bwd_block_q, bwd_block_k, inner_kv):
    if bwd_impl == "pallas":
        out, lse = _flash_mqa_fwd_only(
            q, k, v, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
            interpret=interpret, save_lse=True, inner_kv=inner_kv,
        )
        return out, (q, k, v, out, lse)
    out = _flash_mqa_fwd_only(
        q, k, v, sm_scale=sm_scale, block_q=block_q, block_k=block_k,
        interpret=interpret, inner_kv=inner_kv,
    )
    return out, (q, k, v, None, None)


def _flash_mqa_vjp_bwd(sm_scale, block_q, block_k, interpret, bwd_impl,
                       bwd_block_q, bwd_block_k, inner_kv, residuals, g):
    q, k, v, out, lse = residuals
    if bwd_impl == "pallas":
        return _bwd_pallas(
            q, k, v, out, lse, g, sm_scale=sm_scale, interpret=interpret,
            block_q=bwd_block_q, block_k=bwd_block_k,
        )
    # chunked by the BWD block (the b=1 xla-scan A/B was measured at 512;
    # the fwd blocks may now be larger and must not leak into it)
    return _bwd_xla_scan(q, k, v, g, sm_scale=sm_scale, block_q=bwd_block_q)


def _bwd_xla_scan(q, k, v, g, *, sm_scale, block_q):
    """Memory-bounded blockwise backward (lax.scan over query chunks).

    Never materializes the full (n_q, n_kv) similarity: each scan step
    recomputes one q-chunk's attention row block, forms dS locally, emits
    that chunk's dQ and accumulates dK/dV. Peak extra memory is one
    (block, n_kv) tile — this is what makes flash attention TRAINABLE at
    the 23k-token bottleneck where XLA's attention backward cannot exist
    (68 GB sim). Standard flash-backward math:
        D  = rowsum(dO * O);  dS = P * (dP - D)
        dQ = scale * dS K;  dK = scale * dS^T Q;  dV = P^T dO
    """
    b, n_q, d = q.shape
    n_kv = k.shape[1]
    chunk = max(block_q, 512)
    n_pad = _round_up(n_q, chunk)
    pad = n_pad - n_q

    # all-f32 on purpose: a bf16-dot variant (cast p/dS to bf16 for the four
    # einsums, f32 accumulation) measured SLOWER at the 23k geometry — the
    # extra conversion passes over the HBM-resident (chunk, n_kv) tiles cost
    # more than the faster MXU dots save (probe20: 472.9 vs 412.5 ms).
    qf = jnp.pad(q, ((0, 0), (0, pad), (0, 0))).astype(jnp.float32)
    gf = jnp.pad(g, ((0, 0), (0, pad), (0, 0))).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    # mask padded q rows out of the parameter grads
    row_valid = (jnp.arange(n_pad) < n_q).astype(jnp.float32)[None, :, None]
    gf = gf * row_valid

    qs = qf.reshape(b, n_pad // chunk, chunk, d).transpose(1, 0, 2, 3)
    gs = gf.reshape(b, n_pad // chunk, chunk, d).transpose(1, 0, 2, 3)

    def step(carry, xs):
        dk_acc, dv_acc = carry
        q_c, g_c = xs  # (b, chunk, d)
        s = jnp.einsum("bcd,bmd->bcm", q_c, kf) * sm_scale
        p = jax.nn.softmax(s, axis=-1)
        dp = jnp.einsum("bcd,bmd->bcm", g_c, vf)
        dd = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - dd)
        dq_c = jnp.einsum("bcm,bmd->bcd", ds, kf) * sm_scale
        dk_acc = dk_acc + jnp.einsum("bcm,bcd->bmd", ds, q_c) * sm_scale
        dv_acc = dv_acc + jnp.einsum("bcm,bcd->bmd", p, g_c)
        return (dk_acc, dv_acc), dq_c

    zeros = jnp.zeros((b, n_kv, d), jnp.float32)
    (dk, dv), dqs = jax.lax.scan(step, (zeros, zeros), (qs, gs))
    dq = dqs.transpose(1, 0, 2, 3).reshape(b, n_pad, d)[:, :n_q]
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash_mqa_diff.defvjp(_flash_mqa_vjp_fwd, _flash_mqa_vjp_bwd)


# --------------------------------------------------------------------- #
# Pallas streaming backward: two kernels recompute P tiles from the saved
# row logsumexp (classic flash-attention backward; the r2 XLA-scan variant
# above stays as the A/B reference). Standard algebra per (q-block, k-block):
#     P = exp(S - lse);  dP = dO V^T;  dS = P * (dP - D),  D = rowsum(dO*O)
#     dQ += dS K (* scale);  dK += dS^T Q_scaled;  dV += P^T dO
# Padding discipline:
#   * k is EDGE-padded (copies of the last real row, like the fwd), so a
#     padded column's unmasked p = exp(s_last_real - lse) <= 1 in EVERY
#     regime (lse >= s_last_real by definition of logsumexp) — the kvmask
#     multiply then zeroes it exactly. This keeps the r2 overflow guard
#     (the old zero-pad gave p = exp(0 - lse), infinite once lse < ~-87)
#     WITHOUT the select-inside-the-exponent that r3's first fix used: that
#     select measured 2.5x on the whole VJP (622 vs 245 ms at the b=2
#     23k-token geometry, evidence/perf_r4/flash_bisect.jsonl — these
#     kernels are VPU-bound in sim space, and the masked select broke the
#     exp pipeline); their dk/dv rows are garbage but sliced off
#   * padded Q rows of g are zeros -> dP = 0 and D = 0 there, so dS = 0 and
#     they contribute nothing to dk/dv; their dq rows are sliced off; their
#     padded lse of 0 keeps p finite (s = 0 rows)
# --------------------------------------------------------------------- #
def _mqa_bwd_dq_kernel(q_ref, k_ref, v_ref, g_ref, lse_ref, delta_ref, *refs,
                       sm_scale: float, masked: bool):
    if masked:
        kvmask_ref, dq_ref, dq_acc = refs
    else:
        dq_ref, dq_acc = refs
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]  # (block_q, d), PRE-SCALED by sm_scale
    k = k_ref[0]  # (block_k, d)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = jnp.exp(s - lse_ref[0])  # (block_q, block_k); lse column broadcast
    if masked:
        # finite by edge-padding (p <= 1 at padded columns — header note);
        # the multiply zeroes them exactly at full VPU rate
        p = p * kvmask_ref[0]
    dp = jax.lax.dot_general(
        g_ref[0], v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0])
    dq_acc[:] += jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _finalize():
        # chain rule through the q-prescale: dL/dq = sm_scale * dL/dq_scaled
        dq_ref[0] = (dq_acc[:] * sm_scale).astype(dq_ref.dtype)


def _mqa_bwd_dkv_kernel(q_ref, g_ref, lse_ref, delta_ref, k_ref, v_ref, *refs,
                        masked: bool):
    if masked:
        kvmask_ref, dk_ref, dv_ref, dk_acc, dv_acc = refs
    else:
        dk_ref, dv_ref, dk_acc, dv_acc = refs
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0]  # PRE-SCALED: dk = dS^T q_scaled is exactly dL/dk
    g = g_ref[0]
    s = jax.lax.dot_general(
        q, k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    p = jnp.exp(s - lse_ref[0])
    if masked:
        p = p * kvmask_ref[0]  # finite by edge-padding — see dq kernel note
    dp = jax.lax.dot_general(
        g, v_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta_ref[0])
    dk_acc[:] += jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dv_acc[:] += jax.lax.dot_general(
        p.astype(g.dtype), g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(qi == pl.num_programs(2) - 1)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_pallas(q, k, v, out, lse, g, *, sm_scale, interpret,
                block_q: int = 512, block_k: int = 1024):
    """Both bwd kernels at (block_q, block_k) = (512, 1024) by default —
    r3 A/B'd on TPU against the r2 XLA scan (docs/PERF.md r3)."""
    b, n_q, d = q.shape
    n_kv = k.shape[1]
    n_q_pad = _round_up(n_q, block_q)
    n_kv_pad = _round_up(n_kv, block_k)

    qs = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    delta = jnp.sum(
        g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1, keepdims=True
    )  # (b, n_q, 1)

    pad_q = lambda x: jnp.pad(x, ((0, 0), (0, n_q_pad - x.shape[1]), (0, 0)))
    pad_kv = lambda x, **kw: jnp.pad(
        x, ((0, 0), (0, n_kv_pad - x.shape[1]), (0, 0)), **kw
    )
    qs_p, g_p = pad_q(qs), pad_q(g)
    lse_p, delta_p = pad_q(lse), pad_q(delta)
    # k edge-padded: padded columns then carry the last real row's logit,
    # so their unmasked p = exp(s_last - lse) <= 1 (overflow-proof) and the
    # kvmask multiply zeroes them exactly (kernel header note)
    k_p, v_p = pad_kv(k, mode="edge"), pad_kv(v)
    masked = n_kv_pad != n_kv
    mask_args = []
    if masked:
        mask_args = [
            (jnp.arange(n_kv_pad) < n_kv).astype(jnp.float32)[None, :]
        ]

    spec_q = pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0))
    spec_kv_for_q = pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0))
    spec_col_for_q = pl.BlockSpec((1, block_q, 1), lambda bi, qi, ki: (bi, qi, 0))
    spec_mask_for_q = pl.BlockSpec((1, block_k), lambda bi, qi, ki: (0, ki))
    dq = pl.pallas_call(
        functools.partial(_mqa_bwd_dq_kernel, sm_scale=sm_scale, masked=masked),
        grid=(b, n_q_pad // block_q, n_kv_pad // block_k),
        in_specs=[spec_q, spec_kv_for_q, spec_kv_for_q, spec_q,
                  spec_col_for_q, spec_col_for_q]
        + ([spec_mask_for_q] if masked else []),
        out_specs=spec_q,
        out_shape=jax.ShapeDtypeStruct((b, n_q_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qs_p, k_p, v_p, g_p, lse_p, delta_p, *mask_args)

    spec_q2 = pl.BlockSpec((1, block_q, d), lambda bi, ki, qi: (bi, qi, 0))
    spec_col2 = pl.BlockSpec((1, block_q, 1), lambda bi, ki, qi: (bi, qi, 0))
    spec_kv2 = pl.BlockSpec((1, block_k, d), lambda bi, ki, qi: (bi, ki, 0))
    spec_mask2 = pl.BlockSpec((1, block_k), lambda bi, ki, qi: (0, ki))
    dk, dv = pl.pallas_call(
        functools.partial(_mqa_bwd_dkv_kernel, masked=masked),
        grid=(b, n_kv_pad // block_k, n_q_pad // block_q),
        in_specs=[spec_q2, spec_q2, spec_col2, spec_col2, spec_kv2, spec_kv2]
        + ([spec_mask2] if masked else []),
        out_specs=[spec_kv2, spec_kv2],
        out_shape=[jax.ShapeDtypeStruct((b, n_kv_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((b, n_kv_pad, d), v.dtype)],
        scratch_shapes=[pltpu.VMEM((block_k, d), jnp.float32),
                        pltpu.VMEM((block_k, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qs_p, g_p, lse_p, delta_p, k_p, v_p, *mask_args)

    return dq[:, :n_q], dk[:, :n_kv], dv[:, :n_kv]


def _auto_block_k(n_kv: int) -> int:
    """Default BACKWARD kv block: 1024 for long-context shapes (probe19:
    31.0 vs 18.7 TF/s fwd at 23k tokens), 512 below — a 1024 block on e.g.
    the 1025-token 16-frame sampling shape would pad kv 1025 -> 2048.
    The bwd pair was tuned at (512, 1024) (r3 bwd A/B) and is NOT covered
    by the probe10 forward sweep, so it keeps this ladder."""
    return 1024 if n_kv >= 4096 else 512


def _auto_fwd_blocks(n_q: int, n_kv: int) -> tuple:
    """Default FORWARD (block_q, block_k): probe10 swept the 23k-token
    regime (runs/perf_r3_probe10.jsonl) — (1024, 2048) measures 38.0 TF/s
    vs (512, 1024)'s 32.4 (+17%); each upgrade is independently positive
    ((1024,1024) 36.7, (512,2048) 35.2). Bigger blocks amortize the
    per-grid-cell serial chain (probe9) over more MXU work. Thresholds
    keep short shapes on the small blocks so padding never exceeds ~2x:
    block_q 1024 needs n_q >= 8192 (heads are folded into n_q, so the
    16-frame 1025-token sampling shape with 16 heads already qualifies);
    block_k 2048 needs n_kv >= 16384 (the padded-kv overhead at 23041
    tokens is 6.7%, already inside the measured win)."""
    block_q = 1024 if n_q >= 8192 else 512
    if n_kv >= 16384:
        block_k = 2048
    elif n_kv >= 4096:
        block_k = 1024
    else:
        block_k = 512
    return block_q, block_k


def flash_mqa(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    sm_scale: float = 1.0,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    bwd_impl: str = "auto",  # "auto" | "pallas" | "xla_scan"
    bwd_block_q: int = 512,
    bwd_block_k: Optional[int] = None,
    inner_kv: int = 1,
) -> jnp.ndarray:
    """Differentiable flash MQA: Pallas streaming forward + a backward
    chosen per GEOMETRY (r3 probes 1/5, runs/perf_r3_probe{1,5}.jsonl):

      * batch >= 2: the Pallas streaming backward (_bwd_pallas, recomputed
        P tiles from the saved row logsumexp) — 245.8 ms full VJP at the
        (b=2, 23k-token) SR bottleneck vs 410.5 ms for the r2 XLA scan
      * batch == 1: the blockwise XLA-scan backward — at (b=1, 23k) it
        measures FASTER than the Pallas pair (108.3 vs 127.6 ms; XLA's
        single-batch scan einsums tile the MXU better than two extra
        kernel launches), and ties at 5.7k tokens

    "auto" applies that rule at trace time from the static batch dim."""
    auto_q, auto_k = _auto_fwd_blocks(q.shape[1], k.shape[1])
    if block_q is None:
        block_q = auto_q
    if block_k is None:
        block_k = auto_k
    if bwd_block_k is None:
        bwd_block_k = _auto_block_k(k.shape[1])
    if bwd_impl == "auto":
        bwd_impl = "pallas" if q.shape[0] >= 2 else "xla_scan"
    return _flash_mqa_diff(q, k, v, sm_scale, block_q, block_k, interpret,
                           bwd_impl, bwd_block_q, bwd_block_k, inner_kv)


@functools.partial(
    jax.jit,
    static_argnames=(
        "sm_scale", "block_q", "block_k", "interpret", "save_lse", "use_exp2",
        "inner_kv",
    ),
)
def _flash_mqa_fwd_only(
    q: jnp.ndarray,  # (b, n_q, d)   n_q = q_heads * seq (heads folded in)
    k: jnp.ndarray,  # (b, n_kv, d)  single kv head
    v: jnp.ndarray,  # (b, n_kv, d)
    *,
    sm_scale: float = 1.0,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: bool = False,
    save_lse: bool = False,
    use_exp2: bool = False,
    inner_kv: int = 1,
) -> jnp.ndarray:
    """Streaming softmax(q k^T * scale) v with one shared kv head.
    (block defaults apply when called directly; flash_mqa/mqa_attention
    pick them adaptively via _auto_fwd_blocks.)

    Handles arbitrary (unaligned) sequence lengths by padding to block
    multiples; padding keys are masked, padding queries produce garbage rows
    that are sliced off.
    """
    b, n_q, d = q.shape
    _, n_kv, _ = k.shape

    # fold the softmax scale into q once (one (n_q, d) mul) instead of
    # scaling every (block_q, block_k) sim tile inside the kernel;
    # use_exp2 additionally folds log2(e) so the kernel runs base-2 softmax
    scale = sm_scale * (1.4426950408889634 if use_exp2 else 1.0)
    q = (q.astype(jnp.float32) * scale).astype(q.dtype)

    # each grid cell consumes inner_kv sub-tiles of block_k — the DMA block
    # (and the kv padding granularity) is their product
    kv_tile = block_k * inner_kv
    n_q_pad = _round_up(n_q, block_q)
    n_kv_pad = _round_up(n_kv, kv_tile)
    if n_q_pad != n_q:
        q = jnp.pad(q, ((0, 0), (0, n_q_pad - n_q), (0, 0)))
    if n_kv_pad != n_kv:
        # k is EDGE-padded (copies of the last real row): padded columns
        # then carry real logits, so they can never dominate the running
        # max — real p stays exact even when every real logit < -87. Their
        # contribution to output and denominator is still exactly zero
        # through v_ext's zeroed rows (v itself is zero-padded).
        k = jnp.pad(k, ((0, 0), (0, n_kv_pad - n_kv), (0, 0)), mode="edge")
        v = jnp.pad(v, ((0, 0), (0, n_kv_pad - n_kv), (0, 0)))

    # fused-denominator extension: d extra v columns of (1 if real row
    # else 0) make the kernel's p @ v_ext dot carry l in its upper half
    # (same 128-lane MXU tile at d<=64 — the denominator costs nothing);
    # kv padding masks itself through these columns, so the kernel has
    # no mask argument at all
    ones_col = (jnp.arange(n_kv_pad) < n_kv).astype(v.dtype)
    v_ext = jnp.concatenate(
        [v, jnp.broadcast_to(ones_col[None, :, None], (b, n_kv_pad, d))],
        axis=-1,
    )

    grid = (b, n_q_pad // block_q, n_kv_pad // kv_tile)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
        pl.BlockSpec((1, kv_tile, d), lambda bi, qi, ki: (bi, ki, 0)),
        pl.BlockSpec((1, kv_tile, 2 * d), lambda bi, qi, ki: (bi, ki, 0)),
    ]
    args = [q, k, v_ext]

    out_specs = [pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, n_q_pad, d), q.dtype)]
    if save_lse:
        # row logsumexp for the Pallas backward; kept PADDED (bwd re-pads to
        # its own blocks from the sliced view, so slice here for a clean API)
        out_specs.append(
            pl.BlockSpec((1, block_q, 1), lambda bi, qi, ki: (bi, qi, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((b, n_q_pad, 1), jnp.float32))

    res = pl.pallas_call(
        functools.partial(
            _flash_mqa_kernel, d=d, save_lse=save_lse, use_exp2=use_exp2,
            inner_kv=inner_kv,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs if save_lse else out_specs[0],
        out_shape=out_shape if save_lse else out_shape[0],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 2 * d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    if save_lse:
        out, lse = res
        return out[:, :n_q], lse[:, :n_q]
    return res[:, :n_q]


def mqa_attention(
    q: jnp.ndarray,  # (b, n, h, d)
    k: jnp.ndarray,  # (b, m, d) single kv head (null kv already prepended)
    v: jnp.ndarray,  # (b, m, d)
    *,
    sm_scale: float,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    interpret: bool = False,
    bwd_impl: str = "auto",
    bwd_block_q: int = 512,
    bwd_block_k: Optional[int] = None,
    inner_kv: int = 1,
) -> jnp.ndarray:
    """MQA wrapper matching models.layers.Attention's einsum semantics:
    folds q heads into the query-sequence axis (every head shares kv), runs
    the flash kernel, unfolds. Returns (b, n, h, d)."""
    b, n, h, d = q.shape
    q_folded = q.transpose(0, 2, 1, 3).reshape(b, h * n, d)
    out = flash_mqa(
        q_folded, k, v,
        sm_scale=sm_scale, block_q=block_q, block_k=block_k, interpret=interpret,
        bwd_impl=bwd_impl, bwd_block_q=bwd_block_q, bwd_block_k=bwd_block_k,
        inner_kv=inner_kv,
    )
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
