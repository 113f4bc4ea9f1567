"""Round-2 perf probe #19: flash-MQA block-size sweep at the 23k-token
90-frame SR bottleneck (VERDICT r1 #4 backlog: kernel runs at 8% of peak,
structurally bounded at ~25% by the d=32 contraction).

Geometry = the shipped SR stage bottleneck: 90 frames x 16x16 = 23040
tokens, heads=16, d=32, batch 2 (bench of record in docs/PERF.md: 136.7 ms
fwd at block 512/512). Sweeps (block_q, block_k) for the forward and the
full VJP, K=4 chained in-jit to wash out dispatch.

Run:  nohup python scripts/perf_r2_probe19.py > runs/perf_r2_probe19.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe19.jsonl"
B, N, H, D = 2, 23040, 16, 32
FLOPS_FWD = 2 * 2 * B * H * N * N * D  # qk^T + pv
SWEEP = [(512, 512), (1024, 512), (512, 1024), (1024, 1024), (2048, 1024),
         (1024, 2048)]


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def main():
    from dalle2_video_tpu.ops.pallas.flash_mqa import mqa_attention

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, N, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, N, D), jnp.bfloat16)
    K = 4

    for bq, bk in SWEEP:
        # ---- forward (chained K times; scalar reduce to force completion)
        @jax.jit
        def fwd(q, k, v):
            def body(c, _):
                o = mqa_attention(c, k, v, sm_scale=D**-0.5,
                                  block_q=bq, block_k=bk)
                return o, ()
            o, _ = jax.lax.scan(body, q, None, length=K)
            return jnp.sum(o.astype(jnp.float32))

        try:
            t0 = time.time()
            float(jax.device_get(fwd(q, k, v)))
            compile_s = time.time() - t0
            t0 = time.time()
            float(jax.device_get(fwd(q, k, v)))
            dt = (time.time() - t0) / K
            record(name=f"mqa19_fwd_{bq}x{bk}", ms=round(dt * 1e3, 2),
                   tflops=round(FLOPS_FWD / dt / 1e12, 1),
                   compile_s=round(compile_s))
        except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
            record(name=f"mqa19_fwd_{bq}x{bk}", error=str(e)[:200])
            continue

        # ---- full VJP (training path)
        @jax.jit
        def bwd(q, k, v):
            def loss(q_, k_, v_):
                o = mqa_attention(q_, k_, v_, sm_scale=D**-0.5,
                                  block_q=bq, block_k=bk)
                return jnp.sum(jnp.square(o.astype(jnp.float32)))
            def body(c, _):
                gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(c, k, v)
                return c + 0.0 * gq, jnp.sum(gk) + jnp.sum(gv)
            _, s = jax.lax.scan(body, q, None, length=K)
            return jnp.sum(s.astype(jnp.float32))

        try:
            t0 = time.time()
            float(jax.device_get(bwd(q, k, v)))
            compile_s = time.time() - t0
            t0 = time.time()
            float(jax.device_get(bwd(q, k, v)))
            dt = (time.time() - t0) / K
            record(name=f"mqa19_vjp_{bq}x{bk}", ms=round(dt * 1e3, 2),
                   tflops=round(3 * FLOPS_FWD / dt / 1e12, 1),
                   compile_s=round(compile_s))
        except Exception as e:  # noqa: BLE001
            record(name=f"mqa19_vjp_{bq}x{bk}", error=str(e)[:200])

    print("probe19 complete", flush=True)


if __name__ == "__main__":
    main()
