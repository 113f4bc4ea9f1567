"""Round-2 perf probe: decompose the bench-config train step on the real TPU.

Measures, in compile-cheapest-first order (results appended to a JSONL log as
they land, so partial runs are still useful):

  1. big bf16 matmul            -> peak-FLOPs sanity for this chip/tunnel
  2. 3x3 conv C=64 vs C=128     -> quantifies the lane-padding tax (PERF.md #1)
  3. forward loss only
  4. forward+backward (no optimizer)
  5. full train step (bench.py baseline)
  6. K=8 steps fused in one lax.scan dispatch (dispatch amortization)

Run:  nohup python scripts/perf_r2_probe.py > runs/perf_r2_probe.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe.jsonl"


def record(name, dt_ms, flops=None, **extra):
    row = {"name": name, "ms": round(dt_ms, 3)}
    if flops:
        row["flops"] = flops
        row["tflops_per_s"] = round(flops / (dt_ms / 1e3) / 1e12, 2)
    row.update(extra)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def sync(out):
    """axon async artifact: block_until_ready can return before execution —
    force a device->host transfer of one scalar leaf to truly drain."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np_val = jax.device_get(jnp.sum(leaf) if leaf.ndim else leaf)
    return float(np_val)


def timed(compiled, args, iters=10, warmup=3):
    out = None
    for _ in range(warmup):
        out = compiled(*args)
    sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = compiled(*args)
    sync(out)
    return (time.time() - t0) / iters * 1e3


def bench_fn(name, fn, args, iters=10, **extra):
    t0 = time.time()
    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    compile_s = time.time() - t0
    print(f"{name}: compiled in {compile_s:.1f}s", flush=True)
    dt = timed(compiled, args, iters=iters)
    record(name, dt, flops=flops, compile_s=round(compile_s, 1), **extra)
    return dt, flops


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind})", flush=True)

    # --- 1. peak sanity: big bf16 matmul ------------------------------- #
    n = 8192
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)

    def mm(a, b):
        return jnp.sum((a @ b).astype(jnp.float32))

    bench_fn("matmul_8192_bf16", mm, (a, b))

    # --- 2. lane padding: 3x3 conv at C=64 vs C=128, equal flops ------- #
    # (B*T, H, W, C) layout as in the unet stage-0 path
    def conv(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(y.astype(jnp.float32))

    x64 = jnp.ones((256, 64, 64, 64), jnp.bfloat16)
    w64 = jnp.ones((3, 3, 64, 64), jnp.bfloat16)
    bench_fn("conv3x3_c64_bf16", conv, (x64, w64))

    x128 = jnp.ones((64, 64, 64, 128), jnp.bfloat16)
    w128 = jnp.ones((3, 3, 128, 128), jnp.bfloat16)
    bench_fn("conv3x3_c128_bf16", conv, (x128, w128))

    # fwd+bwd of the C=64 conv (the training-path cost)
    def conv_grad(x, w):
        return jax.grad(lambda w: conv(x, w))(w).astype(jnp.float32).sum()

    bench_fn("conv3x3_c64_bf16_bwd", conv_grad, (x64, w64))

    # --- model-level probes -------------------------------------------- #
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    B, T, S = 16, 16, 64
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

    # 3. forward loss only (bf16, as in training)
    def fwd_loss(params, key):
        return dec.loss(params, key, video, video_embed=emb,
                        compute_dtype=jnp.bfloat16)

    bench_fn("fwd_loss_b16", fwd_loss, (state.params, jax.random.PRNGKey(3)))

    # 4. forward+backward, no optimizer/EMA
    def fwd_bwd(params, key):
        def lfn(unet_params):
            p = dict(params)
            p["unet_0"] = jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
                unet_params,
            )
            return dec.loss(p, key, video, video_embed=emb,
                            compute_dtype=jnp.bfloat16)

        loss, g = jax.value_and_grad(lfn)(params["unet_0"])
        gn = sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                 for l in jax.tree_util.tree_leaves(g))
        return loss + 0.0 * gn

    bench_fn("fwd_bwd_b16", fwd_bwd, (state.params, jax.random.PRNGKey(3)))

    # 5. full train step (bench.py baseline), dependent chaining
    step = jax.jit(
        lambda s, r: trainer.train_step(s, r, video, video_embed=emb)
    )
    t0 = time.time()
    cstep = step.lower(state, jax.random.PRNGKey(3)).compile()
    cost = cstep.cost_analysis()
    step_flops = float(cost.get("flops", 0.0)) if cost else 0.0
    print(f"train_step: compiled in {time.time()-t0:.1f}s", flush=True)

    key = jax.random.PRNGKey(4)
    st = state
    for _ in range(3):
        key, k = jax.random.split(key)
        st, loss = cstep(st, k)
    sync(loss)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        key, k = jax.random.split(key)
        st, loss = cstep(st, k)
    sync(loss)
    dt = (time.time() - t0) / iters * 1e3
    record("train_step_b16", dt, flops=step_flops)

    # 6. K=8 steps in one scan dispatch
    K = 8
    videos = jax.random.uniform(jax.random.PRNGKey(5), (K, B, T, S, S, 3))
    embs = jax.random.normal(jax.random.PRNGKey(6), (K, B, 512))

    def scan_steps(s, r):
        return trainer.train_steps_scan(s, r, videos, video_embeds=embs)

    t0 = time.time()
    cscan = jax.jit(scan_steps).lower(state, jax.random.PRNGKey(7)).compile()
    cost = cscan.cost_analysis()
    scan_flops = (float(cost.get("flops", 0.0)) if cost else 0.0) / K
    print(f"scan8: compiled in {time.time()-t0:.1f}s", flush=True)
    st = state
    st, losses = cscan(st, jax.random.PRNGKey(8))
    sync(losses)
    iters = 3
    t0 = time.time()
    key = jax.random.PRNGKey(9)
    for _ in range(iters):
        key, k = jax.random.split(key)
        st, losses = cscan(st, k)
    sync(losses)
    dt = (time.time() - t0) / iters / K * 1e3
    record("train_step_scan8_per_step", dt, flops=scan_flops)

    print("probe complete", flush=True)


if __name__ == "__main__":
    main()
