"""Probe #9: frame-paired GROUPED conv — (B*T/2, H, W, 2C) with
feature_group_count=2 computes exactly two frames' C=64 convs per sample
at C=128 lane width. If XLA's grouped-conv emitter is decent this kills
the batch-minor layout pathology at the source (docs/PERF.md r2 profile:
~70-80 ms of copies + batch-minor stats/elementwise at C=64 stages)."""
from __future__ import annotations

import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

LOG = "runs/perf_r2_probe9.jsonl"
K = 16

def record(name, ms, flops=None, **extra):
    row = {"name": name, "ms": round(ms, 4)}
    if flops:
        row["flops"] = flops
        row["tflops_per_s"] = round(flops/(ms/1e3)/1e12, 2)
    row.update(extra)
    with open(LOG, "a") as f: f.write(json.dumps(row)+"\n")
    print("RESULT", json.dumps(row), flush=True)

def sync(x): return float(jax.device_get(x))

def bench_chain(name, op, x0, flops, iters=5):
    def chained(x):
        x, _ = jax.lax.scan(lambda c, _: (op(c), None), x, None, length=K)
        return jnp.sum(x.astype(jnp.float32))
    t0=time.time()
    try:
        compiled = jax.jit(chained).lower(x0).compile()
    except Exception as e:
        record(name, -1.0, error=str(e)[:200]); return
    print(f"{name}: compiled {time.time()-t0:.0f}s", flush=True)
    sync(compiled(x0))
    t0=time.time()
    for _ in range(iters): out = compiled(x0)
    sync(out)
    record(name, (time.time()-t0)/iters/K*1e3, flops=flops)

C = 64
flops = 2 * 256*64*64 * 9 * C * C

# baseline re-measure
w1 = jax.random.normal(jax.random.PRNGKey(1), (3,3,C,C), jnp.bfloat16)*0.05
x1 = jax.random.normal(jax.random.PRNGKey(0), (256,64,64,C), jnp.bfloat16)*0.1
bench_chain("conv64_plain", lambda x: jax.lax.conv_general_dilated(
    x, w1, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC")), x1, flops)

# frame-paired grouped conv: same total flops, C=128 lanes
wg = jnp.concatenate([w1, w1], axis=3)  # (3,3,64,128): group g kernel = w1
xg = jax.random.normal(jax.random.PRNGKey(0), (128,64,64,2*C), jnp.bfloat16)*0.1
bench_chain("conv64_grouped2", lambda x: jax.lax.conv_general_dilated(
    x, wg, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"),
    feature_group_count=2), xg, flops)

# grouped VJP (fwd + dx + dw)
def grouped_vjp(x):
    y, vjp = jax.vjp(lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"),
        feature_group_count=2), x, wg)
    gx, gw = vjp(y*y)
    return gx*1e-2 + x + jnp.sum(gw).astype(x.dtype)*1e-9
bench_chain("conv64_grouped2_vjp", grouped_vjp, xg, 3*flops)

def plain_vjp(x):
    y, vjp = jax.vjp(lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC")), x, w1)
    gx, gw = vjp(y*y)
    return gx*1e-2 + x + jnp.sum(gw).astype(x.dtype)*1e-9
bench_chain("conv64_plain_vjp", plain_vjp, x1, 3*flops)

# 4-frame grouping at C=64 -> 256 lanes
wg4 = jnp.concatenate([w1]*4, axis=3)
xg4 = jax.random.normal(jax.random.PRNGKey(0), (64,64,64,4*C), jnp.bfloat16)*0.1
bench_chain("conv64_grouped4", lambda x: jax.lax.conv_general_dilated(
    x, wg4, (1,1), "SAME", dimension_numbers=("NHWC","HWIO","NHWC"),
    feature_group_count=4), xg4, flops)

print("probe9 complete", flush=True)
