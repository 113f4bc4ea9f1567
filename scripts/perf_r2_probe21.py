"""Round-2 perf probe #21: the reference's EXACT shipped SR stage.

The reference's decoder config (/root/reference/configs/celebv-text.yaml:
51-61) is unet1 dim=64 mults[1,2,4,8] and unet2 dim=8 mults[1,2,4,8,16],
frame_sizes [64,128], frame_numbers [90,90], batch_size 1 — the workload
its README says "does not run at DeepSpeed ZeRO-3 even with batch_size=1".
Earlier SR measurements here used wider 4-stage SR unets (bottleneck 23k
tokens); this probe trains the literal unet2 (5 stages -> 8px bottleneck,
90x8x8 = 5760 joint tokens) so the "shipped recipe" rows in docs/PERF.md
are exact. Measures the B=1 trainer step with flash attention and with XLA
attention (5760 tokens may still compile under XLA — A/B decides the
default claim).

Run:  nohup python scripts/perf_r2_probe21.py > runs/perf_r2_probe21.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe21.jsonl"
B, T, S = 1, 90, 128


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def measure(attn_impl):
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    base = UNet3DConfig(dim=16, dim_mults=(1, 2), video_embed_dim=512,
                        num_resnet_blocks=1, attn_heads=2, attn_dim_head=16)
    # reference unet2 verbatim: dim 8, mults [1,2,4,8,16] (yaml:55-57)
    sr = UNet3DConfig(dim=8, dim_mults=(1, 2, 4, 8, 16), video_embed_dim=512,
                      num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
                      attention_impl=attn_impl)
    cfg = VideoDecoderConfig(
        unets=(base, sr), frame_sizes=(64, S), frame_numbers=(T, T),
        timesteps=1000, learned_variance=False,
    )
    dec = VideoDecoder(cfg)
    # reference decoder_trainer: lr 3e-4, wd 1e-2, use_ema False (yaml:70-76)
    trainer = DecoderTrainer(
        dec, DecoderTrainerConfig(lr=3e-4, wd=1e-2, use_ema=False,
                                  bf16_compute=True)
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, S, S, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, 512))

    step = jax.jit(lambda s, r: trainer.train_step(
        s, r, video, video_embed=emb, unet_number=2))
    t0 = time.time()
    try:
        compiled = step.lower(state, jax.random.PRNGKey(3)).compile()
    except Exception as e:  # noqa: BLE001
        record(name=f"ref_sr_{attn_impl}", error=str(e)[:300])
        return
    print(f"{attn_impl}: compiled {time.time()-t0:.0f}s", flush=True)
    key = jax.random.PRNGKey(4)
    try:
        for _ in range(3):
            key, k = jax.random.split(key)
            state, loss = compiled(state, k)
        float(jax.device_get(loss))
    except Exception as e:  # noqa: BLE001
        record(name=f"ref_sr_{attn_impl}", error="runtime: " + str(e)[:300])
        return
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        key, k = jax.random.split(key)
        state, loss = compiled(state, k)
    float(jax.device_get(loss))
    dt = (time.time() - t0) / iters
    record(name=f"ref_sr_{attn_impl}", ms=round(dt * 1e3, 2),
           frames_per_s=round(B * T / dt, 1), loss=float(loss))


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    measure("flash")
    measure("xla")
    print("probe21 complete", flush=True)


if __name__ == "__main__":
    main()
