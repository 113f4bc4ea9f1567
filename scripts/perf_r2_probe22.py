"""Round-2 perf probe #22: mask-free flash-MQA forward (sim-space VPU diet).

Probe19 left the forward at 31 TF/s vs the ~49 TF/s d=32 structural bound;
the gap is per-element VPU work in sim space (5-6 passes/element), not MXU.
This probe measures the landed diet: sm_scale folded into q outside the
kernel (kills one sim-size mul) and the padding mask reduced from
iota+add+compare+select every block to a single column-vector multiply
(and to NOTHING on aligned shapes). Same harness as probe19 fwd.

Run:  nohup python scripts/perf_r2_probe22.py > runs/perf_r2_probe22.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe22.jsonl"
B, N, H, D = 2, 23040, 16, 32
FLOPS_FWD = 2 * 2 * B * H * N * N * D
K = 4


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def main():
    from dalle2_video_tpu.ops.pallas.flash_mqa import mqa_attention

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, N, H, D), jnp.bfloat16)
    # n_kv = N exactly -> aligned (maskless) path at block_k 1024;
    # n_kv = N+1 (the null-kv case) -> mask-multiply path
    for label, nkv in (("aligned", N), ("nullkv", N + 1)):
        k = jax.random.normal(kk, (B, nkv, D), jnp.bfloat16)
        v = jax.random.normal(kv, (B, nkv, D), jnp.bfloat16)
        for bq, bk in ((512, 1024), (1024, 1024)):
            @jax.jit
            def fwd(q, k, v):
                def body(c, _):
                    o = mqa_attention(c, k, v, sm_scale=D**-0.5,
                                      block_q=bq, block_k=bk)
                    return o, ()
                o, _ = jax.lax.scan(body, q, None, length=K)
                return jnp.sum(o.astype(jnp.float32))

            t0 = time.time()
            float(jax.device_get(fwd(q, k, v)))
            cs = time.time() - t0
            t0 = time.time()
            float(jax.device_get(fwd(q, k, v)))
            dt = (time.time() - t0) / K
            record(name=f"mqa22_{label}_{bq}x{bk}", ms=round(dt * 1e3, 2),
                   tflops=round(FLOPS_FWD / dt / 1e12, 1), compile_s=round(cs))
    print("probe22 complete", flush=True)


if __name__ == "__main__":
    main()
