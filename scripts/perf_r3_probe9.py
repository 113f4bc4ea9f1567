"""Round-3 perf probe #9: flash-MQA fwd — inner-kv unrolling for ILP.

The fused-denominator fwd (probe8) sits at 32.4 TF/s vs the ~49 TF/s
d=32 structural MXU bound. Per-cell accounting at (block_q, block_k) =
(512, 1024): MXU floor ~1.37 us vs 1.94 us measured — the ~0.55 us gap
matches the serial VPU chain (sub+exp+rowmax over the 512x1024 sim tile)
that sits BETWEEN the two MXU dots. One kv block per grid step gives the
scheduler nothing to overlap; unrolling ``inner`` kv sub-blocks inside a
grid cell creates independent (dot -> exp -> dot) streams whose MXU and
VPU phases can interleave, and amortizes per-step grid/DMA overhead.

Variants (all exact, same online-softmax math):
  * chain-N: unroll N sub-blocks, carrying the running (m, acc) through
    the unroll (minimal extra VMEM; still one serial chain, but grid
    overhead amortized N-fold)
  * par-N: N sub-blocks computed with INDEPENDENT (m_j, acc_j) partials,
    merged at the end of the cell ((block_q, 2d)-sized merges — cheap);
    maximal ILP, N live sim tiles
  * wide-2048: single block_k=2048 dot (same bytes/step as chain-2; tells
    apart "bigger tiles" from "more ILP")

Run:  nohup python scripts/perf_r3_probe9.py > runs/perf_r3_probe9.log 2>&1 &
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dalle2_video_tpu.ops.pallas.flash_mqa import (
    NEG_INF,
    _flash_mqa_fwd_only,
    _round_up,
)

LOG = "runs/perf_r3_probe9.jsonl"

B, SEQ, HEADS, D = 2, 23040, 16, 32  # probe8/19 geometry
N_Q = SEQ * HEADS
N_KV = SEQ + 1


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


# --------------------------------------------------------------------- #
def _inner_kernel(q_ref, k_ref, v_ref, *refs, d, block_k, inner, merge):
    """Fused-denominator fwd with ``inner`` kv sub-blocks per grid cell."""
    refs = list(refs)
    o_ref = refs.pop(0)
    m_scratch, acc_scratch = refs
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q = q_ref[0]
    kk = k_ref[0]  # (inner*block_k, d)
    vv = v_ref[0]  # (inner*block_k, 2d)

    if merge == "chain":
        m_run = m_scratch[:]
        acc = acc_scratch[:]
        for j in range(inner):
            k = kk[j * block_k:(j + 1) * block_k]
            v = vv[j * block_k:(j + 1) * block_k]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_next = jnp.maximum(m_run, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp(s - m_next)
            acc = acc * jnp.exp(m_run - m_next) + jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_run = m_next
        m_scratch[:] = m_run
        acc_scratch[:] = acc
    else:  # par: independent partials, merged at cell end
        parts = []
        for j in range(inner):
            k = kk[j * block_k:(j + 1) * block_k]
            v = vv[j * block_k:(j + 1) * block_k]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_j = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp(s - m_j)
            a_j = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            parts.append((m_j, a_j))
        m_run = m_scratch[:]
        acc = acc_scratch[:]
        for m_j, a_j in parts:
            m_next = jnp.maximum(m_run, m_j)
            acc = acc * jnp.exp(m_run - m_next) + a_j * jnp.exp(m_j - m_next)
            m_run = m_next
        m_scratch[:] = m_run
        acc_scratch[:] = acc

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        a = acc_scratch[:]
        o_ref[0] = (a[:, :d] / a[:, d:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "block_q", "block_k", "inner", "merge", "interpret"))
def inner_fwd(q, k, v, *, sm_scale, block_q=512, block_k=1024, inner=2,
              merge="chain", interpret=False):
    b, n_q, d = q.shape
    _, n_kv, _ = k.shape
    q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
    n_q_pad = _round_up(n_q, block_q)
    n_kv_pad = _round_up(n_kv, block_k * inner)
    q = jnp.pad(q, ((0, 0), (0, n_q_pad - n_q), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, n_kv_pad - n_kv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, n_kv_pad - n_kv), (0, 0)))
    ones_col = (jnp.arange(n_kv_pad) < n_kv).astype(v.dtype)
    v_ext = jnp.concatenate(
        [v, jnp.broadcast_to(ones_col[None, :, None], (b, n_kv_pad, d))],
        axis=-1)
    out = pl.pallas_call(
        functools.partial(_inner_kernel, d=d, block_k=block_k, inner=inner,
                          merge=merge),
        grid=(b, n_q_pad // block_q, n_kv_pad // (block_k * inner)),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
            pl.BlockSpec((1, block_k * inner, d),
                         lambda bi, qi, ki: (bi, ki, 0)),
            pl.BlockSpec((1, block_k * inner, 2 * d),
                         lambda bi, qi, ki: (bi, ki, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_q_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 2 * d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v_ext)
    return out[:, :n_q]


def check_small(interpret=True):
    """Exactness vs the XLA reference at an unaligned small geometry."""
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    b, n_q, n_kv, d = 2, 700, 515, 32
    q = jax.random.normal(kq, (b, n_q, d), jnp.float32)
    k = jax.random.normal(kk, (b, n_kv, d), jnp.float32)
    v = jax.random.normal(kv, (b, n_kv, d), jnp.float32)
    scale = d ** -0.5
    ref = jax.nn.softmax(
        jnp.einsum("bnd,bmd->bnm", q, k) * scale, axis=-1) @ v
    for inner in (2, 4):
        for merge in ("chain", "par"):
            got = inner_fwd(q, k, v, sm_scale=scale, block_q=128, block_k=128,
                            inner=inner, merge=merge, interpret=interpret)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"check inner={inner} merge={merge}: max_err={err:.2e}",
                  flush=True)
            assert err < 1e-4, (inner, merge, err)
    print("small-geometry checks OK", flush=True)


def timeit(name, fn, q, k, v, iters=10, **meta):
    @jax.jit
    def run(q, k, v):
        def body(c, _):
            out = fn(c, k, v)
            g = jnp.sum(out.astype(jnp.float32))
            return c + 0.0 * out.astype(c.dtype), g

        _, s = jax.lax.scan(body, q, None, length=iters)
        return jnp.sum(s)

    t0 = time.time()
    float(jax.device_get(run(q, k, v)))
    compile_s = time.time() - t0
    print(f"{name} compile: {compile_s:.0f}s", flush=True)
    t0 = time.time()
    float(jax.device_get(run(q, k, v)))
    ms = (time.time() - t0) / iters * 1e3
    flops = 4 * B * N_Q * N_KV * D
    record(name=name, ms=round(ms, 2), tf_s=round(flops / ms / 1e9, 2),
           compile_s=round(compile_s), **meta)
    return ms


def main():
    if "--check" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
        check_small(interpret=True)
        return

    print("device:", jax.devices()[0].device_kind, flush=True)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, N_Q, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, N_KV, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, N_KV, D), jnp.bfloat16)
    scale = D ** -0.5

    base = jax.jit(functools.partial(
        _flash_mqa_fwd_only, sm_scale=scale, block_q=512, block_k=1024))
    timeit("r3p9_control_fused", base, q, k, v, kind="probe8 fused kernel")

    for inner, merge in ((2, "chain"), (4, "chain"), (2, "par"), (4, "par")):
        fn = jax.jit(functools.partial(
            inner_fwd, sm_scale=scale, block_q=512, block_k=1024,
            inner=inner, merge=merge))
        try:
            timeit(f"r3p9_inner{inner}_{merge}", fn, q, k, v,
                   kind=f"inner-kv unroll {inner} ({merge})")
        except Exception as e:  # noqa: BLE001 — VMEM overflow is a result
            record(name=f"r3p9_inner{inner}_{merge}", error=str(e)[:300])

    # single wide block: same DMA granularity as chain-2, no unroll
    wide = jax.jit(functools.partial(
        _flash_mqa_fwd_only, sm_scale=scale, block_q=512, block_k=2048))
    try:
        timeit("r3p9_wide2048", wide, q, k, v, kind="single 2048 kv block")
    except Exception as e:  # noqa: BLE001
        record(name="r3p9_wide2048", error=str(e)[:300])

    print("probe r3p9 complete", flush=True)


if __name__ == "__main__":
    main()
