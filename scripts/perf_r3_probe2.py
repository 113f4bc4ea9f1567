"""Round-3 perf probe #2: full SR-stage training steps with the Pallas
flash backward (probe1 landed it: 23k-token VJP 410.5 -> 245.8 ms).

Measures the two flagship long-context training steps end-to-end:
  r3p2_sr_dim64   90-frame x 128px dim-64 SR step, B=1 (record: 680.3 ms
                  with the XLA-scan backward, runs/perf_r2_probe20.jsonl)
  r3p2_sr_ref     reference-EXACT dim-8/5-stage SR step (record: 89.0 ms
                  flash / 97.0 XLA attention, docs/PERF.md r2)

Run:  nohup python scripts/perf_r3_probe2.py > runs/perf_r3_probe2.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r3_probe2.jsonl"


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def sr_step(name, sr_cfg, S=128, T=90, B=1):
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    base = UNet3DConfig(dim=16, dim_mults=(1, 2), video_embed_dim=512,
                        num_resnet_blocks=1, attn_heads=2, attn_dim_head=16)
    cfg = VideoDecoderConfig(
        unets=(base, sr_cfg), frame_sizes=(64, S), frame_numbers=(T, T),
        timesteps=1000, learned_variance=False,
    )
    dec = VideoDecoder(cfg)
    trainer = DecoderTrainer(
        dec, DecoderTrainerConfig(lr=3e-4, use_ema=True, bf16_compute=True)
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, S, S, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, 512))

    step = jax.jit(lambda s, r: trainer.train_step(
        s, r, video, video_embed=emb, unet_number=2))
    t0 = time.time()
    compiled = step.lower(state, jax.random.PRNGKey(3)).compile()
    print(f"{name} compile: {time.time()-t0:.0f}s", flush=True)
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
    record(name=name, ms=round(dt * 1e3, 2),
           frames_per_s=round(B * T / dt, 1), loss=float(loss))


def main():
    from dalle2_video_tpu.models import UNet3DConfig

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    # this repo's heavy SR config: 23k-token bottleneck, flash training
    sr_step("r3p2_sr_dim64_pallas_bwd", UNet3DConfig(
        dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
        num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
        attention_impl="flash"))
    # the reference's exact shipped unet2 (dim 8, 5 stages, 5760 tokens)
    sr_step("r3p2_sr_ref_exact_pallas_bwd", UNet3DConfig(
        dim=8, dim_mults=(1, 2, 4, 8, 16), video_embed_dim=512,
        num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
        attention_impl="flash"))
    print("probe r3p2 complete", flush=True)


if __name__ == "__main__":
    main()
