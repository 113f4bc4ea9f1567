"""Round-2 perf probe #14: fused Block3D megakernel in the FULL bench step.

The per-op profile (probe5) showed GroupNorm statistics + f32 GN fusions
(~80 ms) and layout copies (~43 ms) dominate the 251 ms bench train step
while convs are only 35 ms. Every single-op Pallas substitution lost to
XLA because each pallas_call boundary re-exposed a layout seam. This probe
measures the whole-block fusion (ops/pallas/fused_block.py): conv + bias +
GN-stats in one packed-layout kernel, normalize+FiLM+SiLU as one fused
elementwise, custom VJP with streaming GN backward + packed conv VJP.

Measures the bench-identical trainer step (optimizer + EMA + bf16) with
  fb14_fused  groupnorm_impl="fused"   (C*Co <= 512^2 sites; XLA fallback above)
  fb14_xla    groupnorm_impl="xla"     (control re-measure, same process)

Run:  nohup python scripts/perf_r2_probe14.py > runs/perf_r2_probe14.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe14.jsonl"
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
        groupnorm_impl=impl,
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
    measure("fb14_fused", "fused")
    measure("fb14_xla", "xla")
    print("probe14 complete", flush=True)


if __name__ == "__main__":
    main()
