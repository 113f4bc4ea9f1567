"""Round-3 perf probe #3: what HBM bandwidth can this chip actually reach?

The roofline denominator (VERDICT #1) must be MEASURED, not the 819 GB/s
paper number — the first probe (1-D bf16 saxpy in a scan) reached only
381 GB/s. This sweeps shapes/dtypes/access patterns to find the achievable
ceiling on the axon v5e.

Run:  nohup python scripts/perf_r3_probe3.py > runs/perf_r3_probe3.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r3_probe3.jsonl"
K = 16


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def bench(name, x, fn, bytes_per_pass):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c), ()
        c, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(c.ravel()[:128].astype(jnp.float32))

    try:
        float(jax.device_get(run(x)))
        t0 = time.time()
        float(jax.device_get(run(x)))
        dt = (time.time() - t0) / K
        record(name=name, gbps=round(bytes_per_pass / dt / 1e9, 1),
               ms=round(dt * 1e3, 2))
    except Exception as e:  # noqa: BLE001
        record(name=name, error=str(e)[:200])


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    for dtype, nbytes in [(jnp.bfloat16, 2), (jnp.float32, 4)]:
        tag = jnp.dtype(dtype).name
        # 2-D lane-friendly shape, 2 GiB total
        n_elem = (2 * 1024**3) // nbytes
        rows = n_elem // 1024
        x2 = jnp.ones((rows, 1024), dtype)
        one = jnp.asarray(1.0001, dtype)
        eps = jnp.asarray(1e-6, dtype)
        bench(f"saxpy2d_{tag}", x2, lambda c: c * one + eps, 2 * n_elem * nbytes)
        # pure copy via roll (read + write, no compute)
        bench(f"roll2d_{tag}", x2, lambda c: jnp.roll(c, 1, axis=0),
              2 * n_elem * nbytes)

    # smaller working set (fits flyover buffers better?): 256 MiB bf16
    n_elem = (256 * 1024**2) // 2
    x = jnp.ones((n_elem // 1024, 1024), jnp.bfloat16)
    one = jnp.asarray(1.0001, jnp.bfloat16)
    eps = jnp.asarray(1e-6, jnp.bfloat16)
    bench("saxpy2d_bf16_256mb", x, lambda c: c * one + eps, 2 * n_elem * 2)

    # two-operand add: 3x traffic per pass (read a, read c, write c)
    a = jnp.ones(((1024**3) // 2 // 1024, 1024), jnp.bfloat16)  # 1 GiB
    bench("add2_bf16_1gb", a * 1.0, lambda c: c + a, 3 * a.size * 2)

    print("probe r3p3 complete", flush=True)


if __name__ == "__main__":
    main()
