"""Round-3 perf probe #11: flash-MQA full VJP — fwd-block transfer + bwd
block_k=2048.

Probe10 landed (1024, 2048) FORWARD blocks (+17% fwd-only at 23k tokens)
but probe1's VJP sweep pinned the forward at the old (512, 1024) and its
backward sweep stopped at block_k=1024. Open questions this probe closes:

  1. does the probe10 fwd win transfer into the training VJP (save_lse
     forward at the big blocks + the incumbent (512, 1024) backward)?
  2. does block_k=2048 help the BACKWARD kernels the way it helped the
     forward (dkv kernel scratch at 2048 x 32 f32 x 2 = 512 KB — fits)?
  3. does b=1 flip from xla_scan to pallas once the fwd rides the big
     blocks? (`auto` currently picks xla_scan at b=1: 108.3 vs 127.6 ms.)

Geometry: the shipped SR bottleneck (90f x 16x16 = 23040 tokens, heads=16
folded, d=32, bf16), b=2 then b=1.

Run:  nohup python scripts/perf_r3_probe11.py > runs/perf_r3_probe11.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "evidence/perf_r4/probe11.jsonl"  # durable witness (VERDICT r3 #2)
N, H, D = 23040, 16, 32


def record(**row):
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def main():
    from dalle2_video_tpu.ops.pallas.flash_mqa import mqa_attention

    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    def run_vjp(name, b, fwd_blocks, **kwargs):
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, N, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (b, N, D), jnp.bfloat16)
        v = jax.random.normal(kv, (b, N, D), jnp.bfloat16)
        K = 4
        flops_fwd = 2 * 2 * b * H * N * N * D
        flops_exec = 7 * flops_fwd // 2  # probe1 accounting

        @jax.jit
        def bwd(q, k, v):
            def loss(q_, k_, v_):
                o = mqa_attention(q_, k_, v_, sm_scale=D**-0.5,
                                  block_q=fwd_blocks[0], block_k=fwd_blocks[1],
                                  **kwargs)
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
            record(name=name, ms=round(dt * 1e3, 2),
                   tflops_exec=round(flops_exec / dt / 1e12, 1),
                   compile_s=round(compile_s))
        except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
            record(name=name, error=str(e)[:300])

    OLD, NEW = (512, 1024), (1024, 2048)

    # b=2: incumbents (probe1 re-baseline), then fwd transfer, then bwd sweep
    run_vjp("r3p11_b2_fwd512x1024_bwd_xla", 2, OLD, bwd_impl="xla_scan")
    run_vjp("r3p11_b2_fwd1024x2048_bwd_xla", 2, NEW, bwd_impl="xla_scan")
    run_vjp("r3p11_b2_fwd512x1024_bwd_pallas512x1024", 2, OLD,
            bwd_impl="pallas", bwd_block_q=512, bwd_block_k=1024)
    run_vjp("r3p11_b2_fwd1024x2048_bwd_pallas512x1024", 2, NEW,
            bwd_impl="pallas", bwd_block_q=512, bwd_block_k=1024)
    for bq, bk in [(512, 2048), (1024, 2048), (1024, 1024), (256, 2048)]:
        run_vjp(f"r3p11_b2_fwd1024x2048_bwd_pallas{bq}x{bk}", 2, NEW,
                bwd_impl="pallas", bwd_block_q=bq, bwd_block_k=bk)

    # b=1: does the big-block fwd flip the auto choice?
    run_vjp("r3p11_b1_fwd512x1024_bwd_xla", 1, OLD, bwd_impl="xla_scan")
    run_vjp("r3p11_b1_fwd1024x2048_bwd_xla", 1, NEW, bwd_impl="xla_scan")
    run_vjp("r3p11_b1_fwd1024x2048_bwd_pallas512x1024", 1, NEW,
            bwd_impl="pallas", bwd_block_q=512, bwd_block_k=1024)
    run_vjp("r3p11_b1_fwd1024x2048_bwd_pallas_best", 1, NEW,
            bwd_impl="pallas", bwd_block_q=512, bwd_block_k=2048)

    print("probe r3p11 complete", flush=True)


if __name__ == "__main__":
    main()
