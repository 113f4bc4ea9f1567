"""Round-4: remat-policy byte-reduction sweep on the bench train step
(VERDICT r3 #1 — the open 40%-MFU question).

The bench program moves 181.6 GB/step (r3 roofline) and the step is
bandwidth-bound; remat policies are the one axis that changes a program's
byte count at (almost) constant math. This sweep compiles the EXACT bench
step (bench.py config: dim-64 unet, B=16, 16x64x64, bf16, EMA) under each
UNet3DConfig.remat_policy, records XLA's post-fusion cost analysis
(bytes accessed / flops / peak memory) — which ranks candidates without
stepping — and then times 10 steps of each anyway (stepping is cheap once
compiled).

Variants:
  base       — no remat at all (the shipped bench row; reproduces 181.6 GB)
  nothing    — jax.checkpoint default over resnet blocks (recompute all)
  dots       — save dot_general results
  conv       — save conv outputs only (they are materialized in fwd anyway;
               GN/FiLM/SiLU interiors + their f32 residuals recomputed fused)
  conv_attn  — conv + attention outputs
  conv_dots  — conv + dots
  conv_b32   — best-guess policy at B=32 (remat may unlock the batch that
               OOMed at 22G/15.75G without it)

Results: evidence/perf_r4/remat_sweep.jsonl (one row per variant).

Run:  setsid nohup python scripts/perf_r4_remat_sweep.py \
        < /dev/null > evidence/perf_r4/remat_sweep.log 2>&1 &
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_DIR = "evidence/perf_r4"
LOG = os.path.join(OUT_DIR, "remat_sweep.jsonl")


def record(**row):
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def run_variant(name: str, remat_policy: str | None, batch: int = 16):
    import jax
    import jax.numpy as jnp

    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    B, T, S = batch, 16, 64
    unet = UNet3DConfig(
        dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
        num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
    )
    if remat_policy is not None:
        unet = dataclasses.replace(
            unet, checkpoint_during_training=True, remat_policy=remat_policy
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
    compile_s = time.time() - t0
    print(f"[{name}] compile: {compile_s:.1f}s", flush=True)

    cost = compiled.cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))
    row = dict(
        name=name, policy=remat_policy or "none", batch=B,
        compile_s=round(compile_s, 1),
        flops=flops, gb_accessed=round(bytes_acc / 1e9, 2),
    )
    try:
        mem = compiled.memory_analysis()
        row["peak_mb"] = round(
            (mem.argument_size_in_bytes + mem.output_size_in_bytes
             + mem.temp_size_in_bytes) / 2**20, 1)
        row["temp_mb"] = round(mem.temp_size_in_bytes / 2**20, 1)
    except Exception as e:  # noqa: BLE001
        row["mem_error"] = str(e)[:120]

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

    row.update(
        ms=round(dt * 1e3, 1),
        frames_per_s=round(B * T / dt, 1),
        mfu_pct=round(flops / dt / 197e12 * 100, 2),
        implied_gbps=round(bytes_acc / dt / 1e9, 1),
        loss=round(float(loss), 4),
    )
    record(**row)
    # free compiled program references before the next variant
    del compiled, step, state
    return row


def main():
    import bench

    bench.wait_for_backend()
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind})", flush=True)
    record(name="sweep_start", device=str(dev.device_kind))

    variants = [
        ("conv", "conv"),          # most promising first (interruption-safe)
        ("base", None),            # reproduce the shipped bench row
        ("conv_dots", "conv_dots"),
        ("dots", "dots"),
        ("conv_attn", "conv_attn"),
        ("nothing", "nothing"),
    ]
    results = {}
    for name, pol in variants:
        try:
            results[name] = run_variant(name, pol)
        except Exception as e:  # noqa: BLE001
            record(name=name, error=str(e)[:300])
            traceback.print_exc()

    # If any remat policy freed enough HBM, try the bigger batch with the
    # best byte-per-frame policy (B=32 OOMed at 22G without remat).
    done = [r for r in results.values() if "ms" in r and r["policy"] != "none"]
    if done:
        best = min(done, key=lambda r: r["gb_accessed"])
        try:
            run_variant(f"{best['policy']}_b32", best["policy"], batch=32)
        except Exception as e:  # noqa: BLE001
            record(name=f"{best['policy']}_b32", error=str(e)[:300])

    record(name="sweep_done")
    print("remat sweep complete", flush=True)


if __name__ == "__main__":
    main()
