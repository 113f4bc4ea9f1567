"""Round-2 perf probe #3: packed Pallas conv vs XLA conv, honest fwd+bwd.

Chained in-jit timing (probe2 style) of:
  - XLA conv vs conv3x3_packed at each unet stage geometry (fwd)
  - XLA vs packed full VJP chains (fwd + dx + dw; loss nonlinear so nothing
    constant-folds — probe2's linear-loss grad numbers were folded away)

Run:  nohup python scripts/perf_r2_probe3.py > runs/perf_r2_probe3.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from dalle2_video_tpu.ops.pallas.spatial_conv import conv3x3_packed, pack_width

LOG = "runs/perf_r2_probe3.jsonl"
K = 16


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
    def chained(x):
        x, _ = jax.lax.scan(lambda c, _: (op(c), None), x, None, length=K)
        return jnp.sum(x.astype(jnp.float32))

    t0 = time.time()
    try:
        compiled = jax.jit(chained).lower(x0).compile()
    except Exception as e:  # Mosaic rejection: record and move on
        record(name, -1.0, error=str(e)[:300])
        return
    print(f"{name}: compiled in {time.time()-t0:.1f}s", flush=True)
    out = compiled(x0)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = compiled(x0)
    sync(out)
    total = (time.time() - t0) / iters
    record(name, total / K * 1e3, flops=flops_per_op)


def xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    # (label, N, H, W, C) — the four unet stage geometries at bench config
    geoms = [
        ("s0", 256, 64, 64, 64),
        ("s1", 256, 32, 32, 64),
        ("s2", 256, 16, 16, 128),
        ("mid", 256, 8, 8, 512),
    ]

    for label, n, h, w_, c in geoms:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (n, h, w_, c), jnp.bfloat16) * 0.1
        wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c), jnp.bfloat16) * 0.05
        flops = 2 * n * h * w_ * 9 * c * c

        # correctness on-device first (cheap shapes compile fast)
        if label == "s1":
            ref = xla_conv(x, wk)
            got_p = conv3x3_packed(pack_width(x), wk)
            got = got_p.reshape(ref.shape)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
            record(f"packed_correctness_{label}", 0.0, max_abs_err=err)

        # fwd chains
        bench_chain(f"xla_conv_fwd_{label}", lambda t, wk=wk: xla_conv(t, wk), x, flops)
        xp = pack_width(x)
        bench_chain(
            f"packed_conv_fwd_{label}",
            lambda t, wk=wk: conv3x3_packed(t, wk),
            xp,
            flops,
        )

        # full VJP chains: fwd + dx + dw with nonlinear loss; gw folded into
        # the output with a NONZERO coefficient (x*0 gets DCE'd)
        def xla_vjp_op(t, wk=wk):
            y, vjp = jax.vjp(lambda a, b: xla_conv(a, b), t, wk)
            gx, gw = vjp(y * y)
            return gx * 1e-2 + t + jnp.sum(gw).astype(t.dtype) * 1e-9

        def packed_vjp_op(t, wk=wk):
            y, vjp = jax.vjp(lambda a, b: conv3x3_packed(a, b), t, wk)
            gx, gw = vjp(y * y)
            return gx * 1e-2 + t + jnp.sum(gw).astype(t.dtype) * 1e-9

        bench_chain(f"xla_conv_vjp_{label}", xla_vjp_op, x, 3 * flops)
        bench_chain(f"packed_conv_vjp_{label}", packed_vjp_op, xp, 3 * flops)

    print("probe3 complete", flush=True)


if __name__ == "__main__":
    main()
