"""Round-3 perf probe #8: fused-denominator flash-MQA forward A/B.

The r2 forward kernel computes the softmax denominator with a per-element
VPU row-sum (l_cur = sum(p)) plus separate l-scratch updates and (when kv
is padded) a kvmask multiply. The r3 kernel fuses l into the p @ v MXU
dot by extending v with d masked-ones columns (d=32 -> 64 lanes = the
same 128-lane MXU tile, so it is free) — deleting sum + l updates + mask
multiply from the sim-space VPU work that bounds this kernel past the
~44 ms MXU floor at the 23k geometry (67.3 ms measured r2 = 32.3 TF/s
vs ~49 TF/s structural d=32 bound).

This probe runs, in ONE session on a quiet host:
  1. r2 control fwd (self-contained copy of the old kernel), 23k b=2
  2. r3 fused fwd, same geometry
  3. r3 fused fwd with save_lse (the training forward)
  4. full VJP with the Pallas bwd (confirm the 245.8 ms r3 number holds
     now that its forward changed)

Run:  nohup python scripts/perf_r3_probe8.py > runs/perf_r3_probe8.log 2>&1 &
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
    _flash_mqa_fwd_only, _round_up, flash_mqa, NEG_INF,
)

LOG = "runs/perf_r3_probe8.jsonl"

# 90f x 16x16 SR bottleneck, heads=16 folded, d=32 (probe19 geometry)
B, SEQ, HEADS, D = 2, 23040, 16, 32
N_Q = SEQ * HEADS  # folded
N_KV = SEQ + 1     # null kv prepended -> unaligned (mask path)


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


# --------------------------------------------------------------------- #
# r2 control: the pre-fusion kernel, verbatim semantics
# --------------------------------------------------------------------- #
def _r2_kernel(q_ref, k_ref, v_ref, *refs, masked: bool):
    refs = list(refs)
    kvmask_ref = refs.pop(0) if masked else None
    o_ref = refs.pop(0)
    m_scratch, l_scratch, acc_scratch = refs
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[:] = jnp.full_like(m_scratch, NEG_INF)
        l_scratch[:] = jnp.zeros_like(l_scratch)
        acc_scratch[:] = jnp.zeros_like(acc_scratch)

    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    m_prev, l_prev = m_scratch[:], l_scratch[:]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_next)
    if masked:
        p = p * kvmask_ref[0]
    l_cur = jnp.sum(p, axis=1, keepdims=True)
    alpha = jnp.exp(m_prev - m_next)
    l_scratch[:] = l_prev * alpha + l_cur
    acc_scratch[:] = acc_scratch[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scratch[:] = m_next

    @pl.when(kv_idx == pl.num_programs(2) - 1)
    def _finalize():
        o_ref[0] = (acc_scratch[:] / l_scratch[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def r2_fwd(q, k, v, *, block_q=512, block_k=1024):
    b, n_q, d = q.shape
    _, n_kv, _ = k.shape
    n_q_pad, n_kv_pad = _round_up(n_q, block_q), _round_up(n_kv, block_k)
    q = jnp.pad(q, ((0, 0), (0, n_q_pad - n_q), (0, 0)))
    k = jnp.pad(k, ((0, 0), (0, n_kv_pad - n_kv), (0, 0)))
    v = jnp.pad(v, ((0, 0), (0, n_kv_pad - n_kv), (0, 0)))
    masked = n_kv_pad != n_kv
    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
        pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0)),
        pl.BlockSpec((1, block_k, d), lambda bi, qi, ki: (bi, ki, 0)),
    ]
    args = [q, k, v]
    if masked:
        kvmask = (jnp.arange(n_kv_pad) < n_kv).astype(jnp.float32)[None, :]
        in_specs.append(pl.BlockSpec((1, block_k), lambda bi, qi, ki: (0, ki)))
        args.append(kvmask)
    out = pl.pallas_call(
        functools.partial(_r2_kernel, masked=masked),
        grid=(b, n_q_pad // block_q, n_kv_pad // block_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda bi, qi, ki: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_q_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(*args)
    return out[:, :n_q]


def timeit(name, fn, q, k, v, iters=10, **meta):
    """K-iteration scan inside ONE jit with the output feeding the carry
    and a scalar reduction at the end — the only timing shape that defeats
    the axon async-dispatch artifact (bare pallas outputs "complete"
    before execution; see CLAUDE.md benchmark hygiene + probe1)."""

    @jax.jit
    def run(q, k, v):
        def body(c, _):
            out = fn(c, k, v)
            outs = out if isinstance(out, tuple) else (out,)
            g = sum(jnp.sum(x.astype(jnp.float32)) for x in outs)
            return c + 0.0 * outs[0].astype(c.dtype), g

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
    print("device:", jax.devices()[0].device_kind, flush=True)
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, N_Q, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, N_KV, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, N_KV, D), jnp.bfloat16)
    scale = D ** -0.5

    # force a scalar reduction inside the timed jit? Not needed here:
    # pallas outputs + block_until_ready measured identically in probe19;
    # keep methodology identical to probe19/22 for comparability.
    ctrl = jax.jit(lambda q, k, v: r2_fwd(q * scale, k, v))
    timeit("r3p8_fwd_r2_control", ctrl, q, k, v, kind="r2 kernel")

    new = jax.jit(functools.partial(
        _flash_mqa_fwd_only, sm_scale=scale, block_q=512, block_k=1024))
    timeit("r3p8_fwd_fused", new, q, k, v, kind="r3 fused-l kernel")

    new_lse = jax.jit(functools.partial(
        _flash_mqa_fwd_only, sm_scale=scale, block_q=512, block_k=1024,
        save_lse=True))
    timeit("r3p8_fwd_fused_lse", new_lse, q, k, v, kind="r3 fused + save_lse")

    # full VJP through the pallas bwd (training path at b>=2)
    def loss(q, k, v):
        return jnp.sum(
            flash_mqa(q, k, v, sm_scale=scale, bwd_impl="pallas")
            .astype(jnp.float32))
    vjp = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
    timeit("r3p8_vjp_pallas_bwd", vjp, q, k, v, iters=5,
           kind="full VJP, fused fwd + pallas bwd")

    print("probe r3p8 complete", flush=True)


if __name__ == "__main__":
    main()
