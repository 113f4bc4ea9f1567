"""Round-2 perf probe #17: pixel-pair-packed Pallas conv fwd at the
small-spatial stages of the FULL bench step.

The conv microbenches (docs/PERF.md r2) showed XLA's forward conv is
halo-dominated at the 8x8/C=512 geometry (21.7 TF/s vs 43.7 for the packed
Pallas kernel) while XLA's VJP is fast (146 TF/s). This probe measures the
hybrid wiring (SpatialConv impl="pallas_small": Pallas fwd at h*w<=256
3x3 sites, XLA bwd via jax.vjp) in the bench-identical trainer step.

  sc17_pallas  spatial_conv_impl="pallas_small"
  sc17_xla     spatial_conv_impl="xla"          (control, same process)

Run:  nohup python scripts/perf_r2_probe17.py > runs/perf_r2_probe17.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe17.jsonl"
B, T, S = 16, 16, 64


def record(name, ms, **extra):
    row = {"name": name, "ms": round(ms, 2)}
    row.update(extra)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def sync(x):
    return float(jax.device_get(x))


def measure(name, impl):
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    unet = UNet3DConfig(
        dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
        num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
        spatial_conv_impl=impl,
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
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    print(f"{name}: compiled in {time.time()-t0:.0f}s", flush=True)

    key = jax.random.PRNGKey(4)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, loss = compiled(state, k)
    sync(loss)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        key, k = jax.random.split(key)
        state, loss = compiled(state, k)
    sync(loss)
    dt = (time.time() - t0) / iters
    record(
        name, dt * 1e3,
        frames_per_s=round(B * T / dt, 1),
        xla_flops=flops,
        loss=float(loss),
    )


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    measure("sc17_pallas", "pallas_small")
    measure("sc17_xla", "xla")
    print("probe17 complete", flush=True)


if __name__ == "__main__":
    main()
