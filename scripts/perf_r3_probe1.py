"""Round-3 perf probe #1: Pallas flash-MQA BACKWARD vs the r2 XLA scan.

VERDICT r2 #2: the 23k-token full VJP is 412 ms with the blockwise XLA-scan
backward vs 67 ms fwd — the 90-frame SR training step is backward-dominated.
This probe A/Bs the new Pallas streaming backward (dq + dkv kernels,
recomputed P tiles from the saved row logsumexp) at the shipped SR
bottleneck geometry (90f x 16x16 = 23040 tokens, heads=16 folded, d=32,
batch 2, bf16), sweeping the bwd block sizes.

Run:  nohup python scripts/perf_r3_probe1.py > runs/perf_r3_probe1.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r3_probe1.jsonl"
B, N, H, D = 2, 23040, 16, 32
FLOPS_FWD = 2 * 2 * B * H * N * N * D  # qk^T + pv
# bwd flops actually executed: dq kernel 3 matmuls + dkv kernel 4 (s and dp
# recomputed in both) = 7/2 x fwd; the "useful" count is 5/2 x.
FLOPS_BWD_EXEC = 7 * FLOPS_FWD // 2


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

    def run_vjp(name, **kwargs):
        @jax.jit
        def bwd(q, k, v):
            def loss(q_, k_, v_):
                o = mqa_attention(q_, k_, v_, sm_scale=D**-0.5,
                                  block_q=512, block_k=1024, **kwargs)
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
                   tflops_exec=round(FLOPS_BWD_EXEC / dt / 1e12, 1),
                   compile_s=round(compile_s))
        except Exception as e:  # noqa: BLE001 — VMEM overflow etc.
            record(name=name, error=str(e)[:300])

    # numerical sanity at a small aligned shape first (compiled, not interpret)
    qs = jax.random.normal(kq, (1, 1024, H, D), jnp.bfloat16)
    ks = jax.random.normal(kk, (1, 1024, D), jnp.bfloat16)
    vs = jax.random.normal(kv, (1, 1024, D), jnp.bfloat16)

    def loss_with(impl, q_, k_, v_):
        o = mqa_attention(q_, k_, v_, sm_scale=D**-0.5, bwd_impl=impl)
        return jnp.sum(jnp.square(o.astype(jnp.float32)))

    try:
        gp = jax.jit(jax.grad(lambda a, b_, c: loss_with("pallas", a, b_, c),
                              argnums=(0, 1, 2)))(qs, ks, vs)
        gx = jax.jit(jax.grad(lambda a, b_, c: loss_with("xla_scan", a, b_, c),
                              argnums=(0, 1, 2)))(qs, ks, vs)
        errs = [float(jnp.max(jnp.abs(a.astype(jnp.float32) - b_.astype(jnp.float32))))
                for a, b_ in zip(gp, gx)]
        scale = [float(jnp.max(jnp.abs(b_.astype(jnp.float32)))) for b_ in gx]
        record(name="r3p1_sanity_compiled", max_abs_err=errs, grad_scale=scale)
    except Exception as e:  # noqa: BLE001
        record(name="r3p1_sanity_compiled", error=str(e)[:300])

    # A/B at the 23k geometry
    run_vjp("r3p1_vjp_xla_scan", bwd_impl="xla_scan")
    for bq, bk in [(512, 1024), (512, 512), (256, 1024), (1024, 1024)]:
        run_vjp(f"r3p1_vjp_pallas_{bq}x{bk}", bwd_impl="pallas",
                bwd_block_q=bq, bwd_block_k=bk)

    print("probe r3p1 complete", flush=True)


if __name__ == "__main__":
    main()
