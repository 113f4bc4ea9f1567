"""Round-4: flash-MQA forward inner-kv amortization sweep (roadmap item 2).

probe9 measured a per-grid-cell serial chain that leaves the MXU idle
between kv steps; probe19 showed the (block_q, block_k) f32 sim tile is
the VMEM item that stops block growth past (1024, 2048). `inner_kv`
(ops/pallas/flash_mqa.py) decouples the two: each grid cell DMAs
inner_kv * block_k kv rows but processes them as an UNROLLED loop of
block_k-wide sub-tiles, so the sim tile stays put while per-cell overhead
is amortized. This sweeps inner_kv at the 23k-token bench geometry
(b=2, 16 q heads folded -> n_q 368640, d=32 — the SR-stage bottleneck)
against the probe10 champion (1024, 2048, inner 1) = 38.0 TF/s.

Emits JSONL rows to evidence/perf_r4/inner_kv.jsonl (fwd TF/s per config,
plus a save_lse VJP A/B for the best config vs the inner=1 default).

Usage: python scripts/perf_r4_inner_kv.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "evidence/perf_r4/inner_kv.jsonl"
N, H, D, B = 23040, 16, 32, 2
K = 8  # timed scan steps per measurement

CONFIGS = [  # (block_q, block_k, inner_kv)
    (1024, 2048, 1),  # probe10 champion — the baseline row
    (1024, 2048, 2),
    (1024, 2048, 4),
    (1024, 1024, 2),
    (1024, 1024, 4),
]


def emit(row: dict) -> None:
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def main() -> None:
    from dalle2_video_tpu.ops.pallas.flash_mqa import mqa_attention

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, N, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, N, D), jnp.bfloat16)
    # 2 matmuls (qk^T, pv) over (n_q_folded, n_kv, d)
    flops = 2 * 2 * B * (N * H) * N * D

    def timed(fn, *args):
        t0 = time.time()
        float(jax.device_get(fn(*args)))
        compile_s = time.time() - t0
        t0 = time.time()
        float(jax.device_get(fn(*args)))
        return (time.time() - t0) / K, compile_s

    results = []
    for bq, bk, inner in CONFIGS:
        @jax.jit
        def fwd(q, k, v, bq=bq, bk=bk, inner=inner):
            # the CARRY is q and each step's output feeds it (x 0.0): without
            # this data dependence XLA hoists the loop-invariant attention
            # out of the scan and the timing measures ONE call / K (the
            # first sweep's 230 TF/s "results" — above chip peak — were
            # exactly this; evidence/perf_r4/inner_kv.jsonl v1 rows)
            def body(c, _):
                o = mqa_attention(c, k, v, sm_scale=D**-0.5, block_q=bq,
                                  block_k=bk, inner_kv=inner)
                # scalar reduction INSIDE the jit: bare Pallas outputs can
                # report ready before execution on axon (CLAUDE.md)
                return c + 0.0 * o.astype(c.dtype), jnp.sum(
                    o.astype(jnp.float32))

            _, s = jax.lax.scan(body, q, None, length=K)
            return jnp.sum(s)

        dt, compile_s = timed(fwd, q, k, v)
        tfs = flops / dt / 1e12
        results.append((tfs, bq, bk, inner))
        emit(dict(kind="fwd", harness="v2_chained", block_q=bq, block_k=bk,
                  inner_kv=inner, ms=round(dt * 1e3, 2), tf_s=round(tfs, 1),
                  compile_s=round(compile_s)))

    results.sort(reverse=True)
    best = results[0]
    emit(dict(kind="fwd_best", tf_s=round(best[0], 1), block_q=best[1],
              block_k=best[2], inner_kv=best[3]))

    # does the fwd win transfer into the training VJP (save_lse fwd +
    # Pallas streaming bwd)? A/B the best inner config against inner=1.
    for inner in sorted({1, best[3]}):
        @jax.jit
        def vjp(q, k, v, inner=inner, bq=best[1], bk=best[2]):
            def loss(q_, k_, v_):
                o = mqa_attention(q_, k_, v_, sm_scale=D**-0.5, block_q=bq,
                                  block_k=bk, inner_kv=inner,
                                  bwd_impl="pallas")
                return jnp.sum(jnp.square(o.astype(jnp.float32)))

            def body(c, _):
                gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(c, k, v)
                return c + 0.0 * gq, jnp.sum(gk) + jnp.sum(gv)

            _, s = jax.lax.scan(body, q, None, length=K)
            return jnp.sum(s.astype(jnp.float32))

        dt, compile_s = timed(vjp, q, k, v)
        emit(dict(kind="vjp", block_q=best[1], block_k=best[2],
                  inner_kv=inner, ms=round(dt * 1e3, 2),
                  compile_s=round(compile_s)))


if __name__ == "__main__":
    main()
