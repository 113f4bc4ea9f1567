"""Round-2 perf probe #6: A/B the in-kernel-backward Pallas GN in the step.

Baselines (probe1/5): train_step 268.8 ms, fwd+bwd 256.9 ms, GN+stats
~80 ms of the profile. Round-1's recompute-backward Pallas GN lost
(548 vs 304 ms); this measures the round-2 version with the backward also
in Pallas.

Run:  nohup python scripts/perf_r2_probe6.py > runs/perf_r2_probe6.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe6.jsonl"
B, T, S = 16, 16, 64


def record(name, ms, flops=None, **extra):
    row = {"name": name, "ms": round(ms, 2)}
    if flops:
        row["flops"] = flops
        row["tflops_per_s"] = round(flops / (ms / 1e3) / 1e12, 2)
    row.update(extra)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def sync(x):
    return float(jax.device_get(x))


def build(gn_impl):
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    unet = UNet3DConfig(
        dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
        num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
        groupnorm_impl=gn_impl,
    )
    cfg = VideoDecoderConfig(
        unets=(unet,), frame_sizes=(S,), frame_numbers=(T,),
        timesteps=1000, learned_variance=False,
    )
    dec = VideoDecoder(cfg)
    trainer = DecoderTrainer(
        dec, DecoderTrainerConfig(lr=3e-4, use_ema=True, bf16_compute=True)
    )
    return dec, trainer


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, S, S, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, 512))

    for impl in ("pallas",):
        dec, trainer = build(impl)
        state = trainer.init_state(jax.random.PRNGKey(0))

        step = jax.jit(lambda s, r: trainer.train_step(s, r, video, video_embed=emb))
        t0 = time.time()
        cstep = step.lower(state, jax.random.PRNGKey(3)).compile()
        cost = cstep.cost_analysis()
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        print(f"train_step[{impl}]: compiled in {time.time()-t0:.0f}s", flush=True)

        key = jax.random.PRNGKey(4)
        st = state
        for _ in range(3):
            key, k = jax.random.split(key)
            st, loss = cstep(st, k)
        sync(loss)
        print(f"loss after warmup: {sync(loss):.4f}", flush=True)
        iters = 10
        t0 = time.time()
        for _ in range(iters):
            key, k = jax.random.split(key)
            st, loss = cstep(st, k)
        sync(loss)
        record(f"train_step_gn_{impl}", (time.time() - t0) / iters * 1e3,
               flops=flops)

    print("probe6 complete", flush=True)


if __name__ == "__main__":
    main()
