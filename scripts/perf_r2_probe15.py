"""Round-2 perf probe #15: flash-MQA block tuning at the 23k-token regime.

PERF.md r1: flash MQA at the shipped SR bottleneck (90 frames x 16x16 =
23040 tokens, heads=16 folded into n_q, d=32) ran 136.7 ms fwd = 15.9 TF/s
(8% of peak). Both matmuls underuse the MXU at d=32 (qk^T: K=32 depth;
p@v: N=32 width) giving a ~40%-of-peak analytic ceiling, and the exp/VPU
work is comparable to the MXU time — so block shape + pipelining is where
the recoverable time is. Sweep (block_q, block_k) for fwd and train-path
fwd+bwd at the real SR geometry.

Run:  nohup python scripts/perf_r2_probe15.py > runs/perf_r2_probe15.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe15.jsonl"

# shipped SR bottleneck: 90 frames x (128/8)^2 spatial = 23040 tokens
B, HEADS, SEQ, D = 2, 16, 23040, 32
N_Q = HEADS * SEQ


def record(name, ms, flops, **extra):
    row = {
        "name": name,
        "ms": round(ms, 2),
        "tflops_per_s": round(flops / (ms / 1e3) / 1e12, 2),
    }
    row.update(extra)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def main():
    from dalle2_video_tpu.ops.pallas.flash_mqa import flash_mqa

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, N_Q, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, SEQ, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, SEQ, D), jnp.bfloat16)
    flops_fwd = 2 * 2 * B * N_Q * SEQ * D  # qk^T + p@v
    sync = lambda x: float(jax.device_get(x))

    def timeit(fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        sync(c(*args))
        t0 = time.time()
        iters = 5
        for _ in range(iters):
            out = c(*args)
        sync(out)
        return (time.time() - t0) / iters * 1e3

    sweeps = [(512, 512), (1024, 512), (512, 1024), (1024, 1024),
              (2048, 1024), (1024, 2304)]
    for bq, bk in sweeps:
        def fwd(q_, k_, v_):
            o = flash_mqa(q_, k_, v_, sm_scale=D**-0.5, block_q=bq, block_k=bk)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        try:
            ms = timeit(fwd, q, k, v)
            record(f"fwd_bq{bq}_bk{bk}", ms, flops_fwd)
        except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
            print(f"fwd_bq{bq}_bk{bk} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    # train path (fwd+bwd) at the best-known and default blocks
    for bq, bk in [(512, 512), (1024, 1024)]:
        def loss(q_, k_, v_):
            o = flash_mqa(q_, k_, v_, sm_scale=D**-0.5, block_q=bq, block_k=bk)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        def step(q_, k_, v_):
            l, g = jax.value_and_grad(loss, argnums=(0, 1, 2))(q_, k_, v_)
            return l + sum(jnp.sum(x.astype(jnp.float32) ** 2) * 1e-9 for x in g)

        try:
            ms = timeit(step, q, k, v)
            record(f"fwdbwd_bq{bq}_bk{bk}", ms, flops_fwd * 3.5)
        except Exception as e:  # noqa: BLE001
            print(f"fwdbwd_bq{bq}_bk{bk} FAILED: {type(e).__name__}: {e}",
                  flush=True)

    print("probe15 complete", flush=True)


if __name__ == "__main__":
    main()
