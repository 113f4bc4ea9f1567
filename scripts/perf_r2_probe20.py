"""Round-2 perf probe #20: flash-MQA backward upgrade, measured end-to-end.

Probe19 found block_k=1024 lifts the forward 18.7 -> 31.0 TF/s and that the
training VJP is dominated by the blockwise-scan backward running its four
(chunk, n_kv) einsums in f32. This probe measures the landed fixes
(default block 512x1024 + dtype-following bf16 backward dots):

  mqa20_vjp        23k-token VJP microbench (record: 457 ms default,
                   412 ms @512x1024, both f32-bwd — probe19)
  sr20_train_step  the full 90-frame x 128px SR-stage trainer step, B=1,
                   flash attention training (record: 155 ms/step r1)

Run:  nohup python scripts/perf_r2_probe20.py > runs/perf_r2_probe20.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe20.jsonl"


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def mqa_vjp():
    from dalle2_video_tpu.ops.pallas.flash_mqa import mqa_attention

    B, N, H, D, K = 2, 23040, 16, 32, 4
    flops = 3 * 2 * 2 * B * H * N * N * D
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (B, N, H, D), jnp.bfloat16)
    k = jax.random.normal(kk, (B, N, D), jnp.bfloat16)
    v = jax.random.normal(kv, (B, N, D), jnp.bfloat16)

    @jax.jit
    def bwd(q, k, v):
        def loss(q_, k_, v_):
            o = mqa_attention(q_, k_, v_, sm_scale=D**-0.5)
            return jnp.sum(jnp.square(o.astype(jnp.float32)))
        def body(c, _):
            gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(c, k, v)
            return c + 0.0 * gq, jnp.sum(gk) + jnp.sum(gv)
        _, s = jax.lax.scan(body, q, None, length=K)
        return jnp.sum(s.astype(jnp.float32))

    t0 = time.time()
    float(jax.device_get(bwd(q, k, v)))
    print(f"vjp compile: {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    float(jax.device_get(bwd(q, k, v)))
    dt = (time.time() - t0) / K
    record(name="mqa20_vjp_bf16bwd_512x1024", ms=round(dt * 1e3, 2),
           tflops=round(flops / dt / 1e12, 1))


def sr_train_step():
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    B, T, S = 1, 90, 128
    # tiny base stage: only the SR unet's step is measured, but the decoder
    # holds BOTH unets (+EMA) in HBM — a second dim-64 unet OOMs at 90x128
    base = UNet3DConfig(dim=16, dim_mults=(1, 2), video_embed_dim=512,
                        num_resnet_blocks=1, attn_heads=2, attn_dim_head=16)
    sr = UNet3DConfig(dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
                      num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
                      attention_impl="flash")
    cfg = VideoDecoderConfig(
        unets=(base, sr), frame_sizes=(64, S), frame_numbers=(T, T),
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
    print(f"sr step compile: {time.time()-t0:.0f}s", flush=True)
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
    record(name="sr20_train_step", ms=round(dt * 1e3, 2),
           frames_per_s=round(B * T / dt, 1), loss=float(loss))


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    if "--sr-only" not in sys.argv:
        mqa_vjp()
    sr_train_step()
    print("probe20 complete", flush=True)


if __name__ == "__main__":
    main()
