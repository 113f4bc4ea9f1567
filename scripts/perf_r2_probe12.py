"""Round-2 perf probe #11: A/B remat-GN (nothing_saveable) + conv_transpose upsample.

Baseline train_step (flax GN): 268.8 ms. Pallas GN (in-kernel bwd): 335 ms
(kernel boundary breaks fusion). This measures the convert-inside-reduce
XLA GroupNorm that never materializes the f32 copy of the activations.

Run:  nohup python scripts/perf_r2_probe12.py > runs/perf_r2_probe12.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, T, S = 16, 16, 64


def sync(x):
    return float(jax.device_get(x))


def main():
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

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
    cstep = step.lower(state, jax.random.PRNGKey(3)).compile()
    cost = cstep.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    print(f"compiled in {time.time()-t0:.0f}s, flops {flops:.3e}", flush=True)

    key = jax.random.PRNGKey(4)
    st = state
    for _ in range(3):
        key, k = jax.random.split(key)
        st, loss = cstep(st, k)
    print(f"warmup loss {sync(loss):.4f}", flush=True)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        key, k = jax.random.split(key)
        st, loss = cstep(st, k)
    sync(loss)
    dt = (time.time() - t0) / iters * 1e3
    mfu = flops / (dt / 1e3) / 197e12
    row = {"name": "train_step_convT_only", "ms": round(dt, 2),
           "flops": flops, "tflops_per_s": round(flops/(dt/1e3)/1e12, 2),
           "mfu_pct": round(mfu * 100, 2)}
    with open("runs/perf_r2_probe12.jsonl", "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
