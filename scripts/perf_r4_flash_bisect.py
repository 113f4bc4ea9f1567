"""Round-4: bisect the flash-MQA Pallas-backward regression (probe11).

probe11 (quiet host) measured the streaming Pallas backward at 612-626 ms
for the b=2 23k-token VJP, vs the 245.8-249 ms recorded when it landed
(c75dc14) — while the XLA-scan comparator reproduces its old number
exactly (411.35 vs 410.5 ms), ruling out host/chip drift. This harness
times the SAME measurement against each historical flash_mqa.py to find
the regressing commit.

Usage:  python scripts/perf_r4_flash_bisect.py <label>
(the caller checks out the candidate flash_mqa.py into the tree first;
one process per candidate so module state is clean)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "evidence/perf_r4/flash_bisect.jsonl"
N, H, D, B, K = 23040, 16, 32, 2, 4


def main():
    label = sys.argv[1]
    from dalle2_video_tpu.ops.pallas.flash_mqa import mqa_attention

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, N, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, N, D), jnp.bfloat16)

    import inspect

    accepted = set(inspect.signature(mqa_attention).parameters)
    kwargs = {
        kk_: vv
        for kk_, vv in dict(
            block_q=512, block_k=1024, bwd_impl="pallas",
            bwd_block_q=512, bwd_block_k=1024,
        ).items()
        if kk_ in accepted
    }
    print(f"[{label}] kwargs: {sorted(kwargs)}", flush=True)

    @jax.jit
    def bwd(q, k, v):
        def loss(q_, k_, v_):
            o = mqa_attention(q_, k_, v_, sm_scale=D**-0.5, **kwargs)
            return jnp.sum(jnp.square(o.astype(jnp.float32)))

        def body(c, _):
            gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(c, k, v)
            return c + 0.0 * gq, jnp.sum(gk) + jnp.sum(gv)

        _, s = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(s.astype(jnp.float32))

    t0 = time.time()
    float(jax.device_get(bwd(q, k, v)))
    compile_s = time.time() - t0
    t0 = time.time()
    float(jax.device_get(bwd(q, k, v)))
    dt = (time.time() - t0) / K

    row = dict(label=label, ms=round(dt * 1e3, 2), compile_s=round(compile_s))
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
