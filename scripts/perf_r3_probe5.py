"""Round-3 perf probe #5: why didn't the Pallas flash backward move the
dim-64 SR step (680.3 -> 676.2 ms, probe2) when the 23k-token VJP
microbench won 410.5 -> 245.8 ms (probe1)?

Two measurements:
  1. the VJP A/B at the SR step's EXACT attention geometry (batch 1 — the
     probe1 microbench ran batch 2)
  2. per-op profile of the SR train step (xplane parse, as probe5-r2) to
     see the attention VJP's actual share of the 676 ms

Run:  nohup python scripts/perf_r3_probe5.py > runs/perf_r3_probe5.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r3_probe5.jsonl"
B, N, H, D = 1, 23040, 16, 32
FLOPS_FWD = 2 * 2 * B * H * N * N * D


def record(**row):
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def vjp_ab():
    from dalle2_video_tpu.ops.pallas.flash_mqa import (
        _flash_mqa_fwd_only,
        mqa_attention,
    )

    # the two REAL step geometries (probe2): dim-64 SR -> (1, 23040) tokens;
    # reference-exact dim-8 SR -> (1, 5761) kv incl. null (masked path)
    for (b, n, label) in [(1, 23040, "23k_b1"), (1, 5761, "5k_b1")]:
        kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(kq, (b, n, H, D), jnp.bfloat16)
        k = jax.random.normal(kk, (b, n, D), jnp.bfloat16)
        v = jax.random.normal(kv, (b, n, D), jnp.bfloat16)
        K = 4
        flops_fwd = 2 * 2 * b * H * n * n * D

        # fwd-only: does save_lse (the pallas-bwd residual) cost anything?
        for save_lse in (False, True):
            qf = q.transpose(0, 2, 1, 3).reshape(b, H * n, D)

            @jax.jit
            def fwd(qf, k, v):
                def body(c, _):
                    o = _flash_mqa_fwd_only(
                        c, k, v, sm_scale=D**-0.5, block_q=512,
                        block_k=1024, save_lse=save_lse)
                    o = o[0] if save_lse else o
                    return o.astype(c.dtype), ()
                o, _ = jax.lax.scan(body, qf, None, length=K)
                return jnp.sum(o.astype(jnp.float32))

            try:
                float(jax.device_get(fwd(qf, k, v)))
                t0 = time.time()
                float(jax.device_get(fwd(qf, k, v)))
                dt = (time.time() - t0) / K
                record(name=f"r3p5_fwd_{label}_lse{int(save_lse)}",
                       ms=round(dt * 1e3, 2),
                       tflops=round(flops_fwd / dt / 1e12, 1))
            except Exception as e:  # noqa: BLE001
                record(name=f"r3p5_fwd_{label}_lse{int(save_lse)}",
                       error=str(e)[:300])

        for impl in ("xla_scan", "pallas"):
            @jax.jit
            def bwd(q, k, v):
                def loss(q_, k_, v_):
                    o = mqa_attention(q_, k_, v_, sm_scale=D**-0.5,
                                      bwd_impl=impl)
                    return jnp.sum(jnp.square(o.astype(jnp.float32)))

                def body(c, _):
                    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(c, k, v)
                    return c + 0.0 * gq, jnp.sum(gk) + jnp.sum(gv)

                _, s = jax.lax.scan(body, q, None, length=K)
                return jnp.sum(s.astype(jnp.float32))

            try:
                float(jax.device_get(bwd(q, k, v)))
                t0 = time.time()
                float(jax.device_get(bwd(q, k, v)))
                dt = (time.time() - t0) / K
                record(name=f"r3p5_vjp_{label}_{impl}", ms=round(dt * 1e3, 2),
                       tflops_fwd_basis=round(3 * flops_fwd / dt / 1e12, 1))
            except Exception as e:  # noqa: BLE001
                record(name=f"r3p5_vjp_{label}_{impl}", error=str(e)[:300])


def sr_profile():
    """Trace the dim-64 SR step and bucket device time by op name."""
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    T, S = 90, 128
    base = UNet3DConfig(dim=16, dim_mults=(1, 2), video_embed_dim=512,
                        num_resnet_blocks=1, attn_heads=2, attn_dim_head=16)
    sr = UNet3DConfig(dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
                      num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
                      attention_impl="flash")
    dec = VideoDecoder(VideoDecoderConfig(
        unets=(base, sr), frame_sizes=(64, S), frame_numbers=(T, T),
        timesteps=1000, learned_variance=False,
    ))
    trainer = DecoderTrainer(
        dec, DecoderTrainerConfig(lr=3e-4, use_ema=True, bf16_compute=True))
    state = trainer.init_state(jax.random.PRNGKey(0))
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, T, S, S, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 512))
    step = jax.jit(lambda s, r: trainer.train_step(
        s, r, video, video_embed=emb, unet_number=2))
    compiled = step.lower(state, jax.random.PRNGKey(3)).compile()
    key = jax.random.PRNGKey(4)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, loss = compiled(state, k)
    float(jax.device_get(loss))

    import glob
    from collections import defaultdict

    trace_dir = "runs/trace_r3_sr"
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            key, k = jax.random.split(key)
            state, loss = compiled(state, k)
        float(jax.device_get(loss))

    # parse xplane: per-op device durations (proven parse from r2 probe5)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())
    totals = defaultdict(float)
    for plane in space.planes:
        if not ("TPU" in plane.name or "/device" in plane.name.lower()):
            continue
        ev_names = {k_: v.name for k_, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                totals[(line.name, name)] += ev.duration_ps / 1e9  # ms
    rows = sorted(totals.items(), key=lambda kv: -kv[1])[:60]
    for (line_name, name), ms in rows:
        record(name="r3p5_sr_op", line=line_name, op=name,
               ms_per_step=round(ms / 2, 3))  # two steps traced


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    vjp_ab()
    try:
        sr_profile()
    except Exception as e:  # noqa: BLE001
        record(name="r3p5_sr_profile_buckets", error=str(e)[:400])
    print("probe r3p5 complete", flush=True)


if __name__ == "__main__":
    main()
