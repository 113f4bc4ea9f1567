"""Round-2 perf probe #2: in-jit chained microbenches (dispatch-free rates).

Each candidate op is iterated K times inside ONE jit via lax.scan with a
serializing data dependency, so the per-op time excludes the ~3-4 ms
dispatch overhead probe #1 exposed.

Candidates (stage-0 geometry: (B*T=256, 64, 64, C=64), bf16):
  a. 3x3 conv C=64->64                       (the lane-padded baseline)
  b. 3x3 conv C=128->128 (same flops)        (full-lane reference)
  c. pixel-pair-packed conv: stride-2-in-W conv with restructured
     (3,4,64,128) kernel == same math as (a) but MXU sees N=128
  d. GroupNorm(8)+FiLM+SiLU chain at stage-0 size (memory-bound check)
  e. fwd+bwd of (a) and (c)

Run:  nohup python scripts/perf_r2_probe2.py > runs/perf_r2_probe2.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe2.jsonl"
K = 16  # in-jit repetitions


def record(name, ms_per_op, flops=None, **extra):
    row = {"name": name, "ms": round(ms_per_op, 4)}
    if flops:
        row["flops"] = flops
        row["tflops_per_s"] = round(flops / (ms_per_op / 1e3) / 1e12, 2)
    row.update(extra)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def sync(x):
    return float(jax.device_get(x))


def bench_chain(name, op, x0, flops_per_op, iters=5):
    """op: x -> x (same shape/dtype). Chains K ops inside one jit."""

    def chained(x):
        x, _ = jax.lax.scan(lambda c, _: (op(c), None), x, None, length=K)
        return jnp.sum(x.astype(jnp.float32))

    t0 = time.time()
    compiled = jax.jit(chained).lower(x0).compile()
    print(f"{name}: compiled in {time.time()-t0:.1f}s", flush=True)
    out = compiled(x0)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = compiled(x0)
    sync(out)
    total = (time.time() - t0) / iters
    record(name, total / K * 1e3, flops=flops_per_op)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind})", flush=True)
    B, H, W, C = 256, 64, 64, 64
    key = jax.random.PRNGKey(0)

    conv_flops = 2 * B * H * W * 9 * C * C  # semantic flops of one 3x3 conv

    # --- a. plain 3x3 conv C=64 ---------------------------------------- #
    w64 = (jax.random.normal(key, (3, 3, C, C), jnp.bfloat16) * 0.05)

    def conv64(x):
        return jax.lax.conv_general_dilated(
            x, w64, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    x64 = jax.random.normal(key, (B, H, W, C), jnp.bfloat16) * 0.1
    bench_chain("chain_conv64", conv64, x64, conv_flops)

    # --- b. plain 3x3 conv C=128 (same total flops) --------------------- #
    w128 = (jax.random.normal(key, (3, 3, 2 * C, 2 * C), jnp.bfloat16) * 0.05)

    def conv128(x):
        return jax.lax.conv_general_dilated(
            x, w128, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    x128 = jax.random.normal(key, (B // 4, H, W, 2 * C), jnp.bfloat16) * 0.1
    bench_chain("chain_conv128", conv128, x128, conv_flops)

    # --- c. pixel-pair-packed conv ------------------------------------- #
    # Restructured kernel K2[kh, kw', ci, p*C+co] = w[kh, kw'-p, ci, co]
    # (zeros out of range); stride (1,2); output (B,H,W/2,2C) -> (B,H,W,C).
    def pack_kernel(w):
        # w: (3,3,C,C) -> (3,4,C,2C)
        z = jnp.zeros((3, 1, C, C), w.dtype)
        k_p0 = jnp.concatenate([w, z], axis=1)      # taps at kw'=0,1,2
        k_p1 = jnp.concatenate([z, w], axis=1)      # taps at kw'=1,2,3
        return jnp.concatenate([k_p0, k_p1], axis=3)  # (3,4,C,2C)

    w2 = pack_kernel(w64)

    def conv_packed(x):
        y = jax.lax.conv_general_dilated(
            x, w2, (1, 2), [(1, 1), (1, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B,H,W//2,2C)
        return y.reshape(B, H, W, C)

    # correctness check vs conv64 before timing
    ref = conv64(x64)
    got = conv_packed(x64)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    print(f"packed-conv max abs err vs plain: {err:.2e}", flush=True)
    record("packed_conv_correctness", 0.0, max_abs_err=err)

    bench_chain("chain_conv64_packed", conv_packed, x64, conv_flops)

    # --- d. GN(8)+FiLM+SiLU at stage-0 size ----------------------------- #
    scale = jax.random.normal(key, (B, 1, 1, C), jnp.bfloat16) * 0.1
    shift = jax.random.normal(key, (B, 1, 1, C), jnp.bfloat16) * 0.1
    gn_scale = jnp.ones((C,), jnp.float32)
    gn_bias = jnp.zeros((C,), jnp.float32)

    def gn_film_silu(x):
        xf = x.astype(jnp.float32).reshape(B, H, W, 8, C // 8)
        mean = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = xf.var(axis=(1, 2, 4), keepdims=True)
        xf = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        xf = xf.reshape(B, H, W, C) * gn_scale + gn_bias
        y = xf.astype(jnp.bfloat16) * (scale + 1) + shift
        return jax.nn.silu(y)

    # bytes moved ~ 2 * B*H*W*C * 2 (read+write, bf16); report as flops=0
    bench_chain("chain_gn_film_silu", gn_film_silu, x64, conv_flops * 0 + 1)

    # --- e. fwd+bwd chains ---------------------------------------------- #
    def make_grad_op(conv, w_like):
        def op(x):
            def f(xw):
                x_, _ = xw
                return jnp.sum(conv(x_).astype(jnp.float32))

            g = jax.grad(f)((x, w_like))[0]
            return g.astype(x.dtype) * 1e-3 + x  # keep magnitude bounded

        return op

    # fwd+bwd(x) of plain conv64: 2 convs worth of flops per op (fwd + dx)
    bench_chain(
        "chain_conv64_fwd_bwd", make_grad_op(conv64, w64), x64, 2 * conv_flops
    )
    bench_chain(
        "chain_conv64_packed_fwd_bwd",
        make_grad_op(conv_packed, w2),
        x64,
        2 * conv_flops,
    )

    # dL/dw of plain vs packed (the filter-gradient GEMM)
    def make_wgrad_op(conv, w):
        def op(x):
            g = jax.grad(lambda w_: jnp.sum(
                jax.lax.conv_general_dilated(
                    x, w_, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                ).astype(jnp.float32)
            ))(w)
            # fold a scalar of the grad back into x to serialize the chain
            return x + jnp.sum(g).astype(x.dtype) * 0.0

        return op

    bench_chain("chain_conv64_wgrad", make_wgrad_op(conv64, w64), x64, conv_flops)

    print("probe2 complete", flush=True)


if __name__ == "__main__":
    main()
