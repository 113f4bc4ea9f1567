"""Round-3: memory-roofline arithmetic for the bench train step (VERDICT #1).

Three measurements in one TPU session:
  1. achievable HBM bandwidth on THIS chip (streaming saxpy read+write, and
     a read-only reduce) — the roofline denominator, not the paper number
  2. the bench step's total HBM traffic from XLA's own post-fusion
     cost_analysis (bytes accessed = operand + output bytes at fusion
     boundaries) + its flops — numerator
  3. a fresh timing of the step in the same session

roofline floor = max(flops / peak_flops, bytes / measured_BW); the gap to
the measured step time is XLA-chosen overhead (layout copies / GN stats),
quantified in docs/PERF.md.

Run:  nohup python scripts/perf_r3_roofline.py > runs/perf_r3_roofline.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r3_roofline.jsonl"


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def measure_hbm_bw():
    n = 1 << 30  # 1Gi bf16 elements = 2 GiB
    x = jnp.ones((n,), jnp.bfloat16)
    K = 8

    @jax.jit
    def saxpy(x):
        def body(c, _):
            return c * jnp.bfloat16(1.0001) + jnp.bfloat16(1e-6), ()
        c, _ = jax.lax.scan(body, x, None, length=K)
        return jnp.sum(c[:128].astype(jnp.float32))

    float(jax.device_get(saxpy(x)))  # compile+warm
    t0 = time.time()
    float(jax.device_get(saxpy(x)))
    dt = (time.time() - t0) / K
    bw_rw = 2 * 2 * n / dt  # read + write, 2 bytes/elem
    record(name="hbm_bw_saxpy_rw", gbps=round(bw_rw / 1e9, 1),
           ms_per_pass=round(dt * 1e3, 2))

    @jax.jit
    def reduce_only(x):
        def body(c, _):
            # carry-dependent scale defeats CSE across iterations
            s = jnp.sum((x * (jnp.bfloat16(1.0) + c.astype(jnp.bfloat16) * jnp.bfloat16(1e-30))).astype(jnp.float32))
            return c + s * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
        return c

    float(jax.device_get(reduce_only(x)))
    t0 = time.time()
    float(jax.device_get(reduce_only(x)))
    dt = (time.time() - t0) / K
    record(name="hbm_bw_reduce_read", gbps=round(2 * n / dt / 1e9, 1),
           ms_per_pass=round(dt * 1e3, 2))
    return bw_rw


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind})", flush=True)

    bw = measure_hbm_bw()

    # ---- bench step, exactly bench.py's config
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    B, T, S = 16, 16, 64
    unet = UNet3DConfig(
        dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
        num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
    )
    cfg = VideoDecoderConfig(
        unets=(unet,), frame_sizes=(S,), frame_numbers=(T,),
        timesteps=1000, learned_variance=False,
    )
    dec = VideoDecoder(cfg)
    trainer = DecoderTrainer(
        dec, DecoderTrainerConfig(lr=3e-4, use_ema=True, bf16_compute=True)
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, S, S, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, 512))

    step = jax.jit(lambda s, r: trainer.train_step(s, r, video, video_embed=emb))
    t0 = time.time()
    compiled = step.lower(state, jax.random.PRNGKey(3)).compile()
    print(f"compile: {time.time()-t0:.1f}s", flush=True)

    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    interesting = {k: v for k, v in cost.items()
                   if ("bytes" in k or k in ("flops", "transcendentals", "optimal_seconds"))
                   and isinstance(v, (int, float)) and v}
    record(name="bench_step_cost_analysis", **{
        k.replace(" ", "_").replace("{", "").replace("}", ""): float(v)
        for k, v in sorted(interesting.items())})

    try:
        mem = compiled.memory_analysis()
        record(name="bench_step_memory",
               argument_mb=round(mem.argument_size_in_bytes / 2**20, 1),
               output_mb=round(mem.output_size_in_bytes / 2**20, 1),
               temp_mb=round(mem.temp_size_in_bytes / 2**20, 1),
               peak_mb=round((mem.argument_size_in_bytes
                              + mem.output_size_in_bytes
                              + mem.temp_size_in_bytes) / 2**20, 1))
    except Exception as e:  # noqa: BLE001
        record(name="bench_step_memory", error=str(e)[:200])

    key = jax.random.PRNGKey(4)
    for _ in range(3):
        key, kk = jax.random.split(key)
        state, loss = compiled(state, kk)
    float(jax.device_get(loss))
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        key, kk = jax.random.split(key)
        state, loss = compiled(state, kk)
    float(jax.device_get(loss))
    dt = (time.time() - t0) / iters

    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    t_compute = flops / 197e12
    t_mem = bytes_acc / bw if bw else 0.0
    record(name="bench_step_roofline",
           measured_ms=round(dt * 1e3, 1),
           flops=flops, bytes_accessed=bytes_acc,
           hbm_bw_gbps=round(bw / 1e9, 1),
           compute_floor_ms=round(t_compute * 1e3, 1),
           memory_floor_ms=round(t_mem * 1e3, 1),
           roofline_floor_ms=round(max(t_compute, t_mem) * 1e3, 1),
           overhead_ratio=round(dt / max(t_compute, t_mem), 2) if max(t_compute, t_mem) else None)

    print("roofline probe complete", flush=True)


if __name__ == "__main__":
    main()
