"""Round-3 perf probe #7: same-session control for the ref-exact SR step.

r2 probe21 measured the reference-exact dim-8 SR step at 89.0 ms (flash)
/ 97.0 ms (XLA attention). r3 sessions measure 136.8 (pallas bwd) and
166.6 (xla_scan bwd) for the SAME flash config while the dim-64 SR step
reproduced its r2 number (672.7 vs 680.3) — so either the flash path
regressed specifically, or the small-program compile drifted. This probe
runs flash and XLA attention back to back in ONE session.

Run:  nohup python scripts/perf_r3_probe7.py > runs/perf_r3_probe7.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r3_probe7.jsonl"


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def sr_step(name, attn_impl):
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    B, T, S = 1, 90, 128
    base = UNet3DConfig(dim=16, dim_mults=(1, 2), video_embed_dim=512,
                        num_resnet_blocks=1, attn_heads=2, attn_dim_head=16)
    sr = UNet3DConfig(dim=8, dim_mults=(1, 2, 4, 8, 16), video_embed_dim=512,
                      num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
                      attention_impl=attn_impl)
    dec = VideoDecoder(VideoDecoderConfig(
        unets=(base, sr), frame_sizes=(64, S), frame_numbers=(T, T),
        timesteps=1000, learned_variance=False,
    ))
    trainer = DecoderTrainer(
        dec, DecoderTrainerConfig(lr=3e-4, use_ema=True, bf16_compute=True))
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
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        key, k = jax.random.split(key)
        state, loss = compiled(state, k)
    float(jax.device_get(loss))
    dt = (time.time() - t0) / iters
    record(name=name, ms=round(dt * 1e3, 2),
           frames_per_s=round(B * T / dt, 1), loss=float(loss))


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    sr_step("r3p7_sr_ref_xla_attn", "xla")
    sr_step("r3p7_sr_ref_flash", "flash")
    sr_step("r3p7_sr_ref_xla_attn_again", "xla")
    print("probe r3p7 complete", flush=True)


if __name__ == "__main__":
    main()
