"""Round-3 perf probe #10: flash-MQA fwd — base-2 softmax (exp2) A/B.

The fused-denominator fwd (probe8) sits at 32.4 TF/s vs the ~49 TF/s d=32
structural bound, with the serial VPU chain (sub + exp + rowmax) between
the two MXU dots identified as the gap (probe9 accounting). exp(x) ==
exp2(x * log2(e)) and the log2(e) multiply folds into the (n_q, d) q
prescale — so a base-2 online softmax deletes one full-sim-tile multiply
from exp's lowering on every kv block, for free. The kernel option is
`use_exp2` in ops/pallas/flash_mqa.py (natural-domain lse preserved for
the backward); exactness verified in interpret mode (tests/test_pallas.py).

Also sweeps block_k=2048 (the probe19 grid stopped at 1024; VMEM at
2048 x 2d bf16 is still < 1 MB so the tile fits — only the pipeline
depth question is open).

Run:  nohup python scripts/perf_r3_probe10.py > runs/perf_r3_probe10.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dalle2_video_tpu.ops.pallas.flash_mqa import _flash_mqa_fwd_only

LOG = "runs/perf_r3_probe10.jsonl"

B, SEQ, HEADS, D = 2, 23040, 16, 32  # probe8/19 geometry
N_Q = SEQ * HEADS
N_KV = SEQ + 1


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def check_small():
    jax.config.update("jax_platforms", "cpu")
    key = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(key, 3)
    b, n_q, n_kv, d = 2, 700, 515, 32
    q = jax.random.normal(kq, (b, n_q, d), jnp.float32)
    k = jax.random.normal(kk, (b, n_kv, d), jnp.float32)
    v = jax.random.normal(kv, (b, n_kv, d), jnp.float32)
    scale = d ** -0.5
    ref = jax.nn.softmax(
        jnp.einsum("bnd,bmd->bnm", q, k) * scale, axis=-1) @ v
    for use_exp2 in (False, True):
        got, lse = _flash_mqa_fwd_only(
            q, k, v, sm_scale=scale, block_q=128, block_k=128,
            interpret=True, save_lse=True, use_exp2=use_exp2)
        err = float(jnp.max(jnp.abs(got - ref)))
        s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
        lse_err = float(jnp.max(jnp.abs(
            lse[..., 0] - jax.scipy.special.logsumexp(s, axis=-1))))
        print(f"check exp2={use_exp2}: max_err={err:.2e} lse_err={lse_err:.2e}",
              flush=True)
        assert err < 1e-4 and lse_err < 1e-3, (use_exp2, err, lse_err)
    print("small-geometry checks OK", flush=True)


def timeit(name, q, k, v, *, iters=10, **kw):
    @jax.jit
    def run(q, k, v):
        def body(c, _):
            out = _flash_mqa_fwd_only(c, k, v, sm_scale=D ** -0.5, **kw)
            if kw.get("save_lse"):
                out = out[0]
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
           compile_s=round(compile_s), **{k: str(v) for k, v in kw.items()})
    return ms


def main():
    if "--check" in sys.argv:
        check_small()
        return
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, N_Q, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, N_KV, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, N_KV, D), jnp.bfloat16)

    for block_q, block_k in ((512, 1024), (1024, 1024), (512, 2048), (1024, 2048)):
        for use_exp2 in (False, True):
            timeit(
                f"fwd_bq{block_q}_bk{block_k}_{'exp2' if use_exp2 else 'exp'}",
                q, k, v, block_q=block_q, block_k=block_k, use_exp2=use_exp2,
            )
    # training mode (save_lse) at the incumbent geometry
    for use_exp2 in (False, True):
        timeit(
            f"fwd_lse_bq512_bk1024_{'exp2' if use_exp2 else 'exp'}",
            q, k, v, block_q=512, block_k=1024, save_lse=True,
            use_exp2=use_exp2,
        )


if __name__ == "__main__":
    main()
