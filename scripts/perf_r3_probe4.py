"""Round-3 perf probe #4: WHERE do the bench step's 181.5 GB/step go?

The roofline probe showed the B=16 bench step moves 181.5 GB (XLA
bytes-accessed) in 253.7 ms — i.e. ~715 GB/s achieved, at/near the HBM
roofline. This probe attributes the bytes by ablation: each variant is
compiled and reports (bytes_accessed, flops, measured ms). If time tracks
bytes across variants, the bandwidth-bound reading is confirmed and the
byte budget tells which subsystem would have to shrink for 40% MFU.

Run:  nohup python scripts/perf_r3_probe4.py > runs/perf_r3_probe4.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r3_probe4.jsonl"


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def variant(name, B=16, groupnorm_impl="xla", bf16=True, ema=True):
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    T, S = 16, 64
    unet = UNet3DConfig(
        dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
        num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
        groupnorm_impl=groupnorm_impl,
    )
    cfg = VideoDecoderConfig(
        unets=(unet,), frame_sizes=(S,), frame_numbers=(T,),
        timesteps=1000, learned_variance=False,
    )
    dec = VideoDecoder(cfg)
    trainer = DecoderTrainer(
        dec, DecoderTrainerConfig(lr=3e-4, use_ema=ema, bf16_compute=bf16)
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, S, S, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, 512))

    step = jax.jit(lambda s, r: trainer.train_step(s, r, video, video_embed=emb))
    try:
        t0 = time.time()
        compiled = step.lower(state, jax.random.PRNGKey(3)).compile()
        compile_s = time.time() - t0
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        key = jax.random.PRNGKey(4)
        for _ in range(3):
            key, k = jax.random.split(key)
            state, loss = compiled(state, k)
        float(jax.device_get(loss))
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            key, k = jax.random.split(key)
            state, loss = compiled(state, k)
        float(jax.device_get(loss))
        dt = (time.time() - t0) / iters
        by = float(cost.get("bytes accessed", 0.0))
        record(name=name, B=B, ms=round(dt * 1e3, 1),
               gbytes=round(by / 1e9, 1),
               gflops=round(float(cost.get("flops", 0.0)) / 1e9, 0),
               implied_gbps=round(by / dt / 1e9, 0),
               compile_s=round(compile_s))
    except Exception as e:  # noqa: BLE001
        record(name=name, B=B, error=str(e)[:300])


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    variant("r3p4_default_b16")                      # anchor (roofline row)
    variant("r3p4_gnskip_b16", groupnorm_impl="skip")  # GN stats ablated
    variant("r3p4_noema_b16", ema=False)             # optimizer/EMA traffic
    variant("r3p4_default_b8", B=8)
    variant("r3p4_f32_b8", B=8, bf16=False)          # dtype bytes scaling
    print("probe r3p4 complete", flush=True)


if __name__ == "__main__":
    main()
