"""Round-2 perf probe #5: per-op XLA profile of the bench train step.

Captures a jax.profiler trace of the full B=16 train step and aggregates
device-plane event durations by op category, dumping the top ops to
runs/perf_r2_probe5.jsonl. This replaces guesswork about where the
268 ms goes (convs vs GN vs attention vs optimizer).

Run:  nohup python scripts/perf_r2_probe5.py > runs/perf_r2_probe5.log 2>&1 &
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe5.jsonl"
TRACE_DIR = "runs/profile_r2"


def sync(x):
    return float(jax.device_get(x))


def capture():
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

    step = jax.jit(lambda s, r: trainer.train_step(s, r, video, video_embed=emb))
    t0 = time.time()
    cstep = step.lower(state, jax.random.PRNGKey(3)).compile()
    print(f"compiled in {time.time()-t0:.0f}s", flush=True)

    st, loss = cstep(state, jax.random.PRNGKey(4))
    sync(loss)

    with jax.profiler.trace(TRACE_DIR):
        for i in range(3):
            st, loss = cstep(st, jax.random.PRNGKey(5 + i))
        sync(loss)
    print("trace captured", flush=True)


def parse():
    paths = glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True)
    print("xplane files:", paths, flush=True)
    if not paths:
        print("NO TRACE FILES — profiling unsupported here?", flush=True)
        return

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    rows = []
    for plane in space.planes:
        is_device = ("TPU" in plane.name or "/device" in plane.name.lower())
        if not is_device:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            # XLA op lines carry per-op events; steps lines carry whole steps
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                totals[(line.name, name)] += ev.duration_ps / 1e9  # ms
                counts[(line.name, name)] += 1
        for (line_name, name), ms in sorted(totals.items(), key=lambda kv: -kv[1])[:80]:
            rows.append({
                "plane": plane.name, "line": line_name, "op": name,
                "ms_total": round(ms, 3), "count": counts[(line_name, name)],
            })

    with open(LOG, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} rows to {LOG}", flush=True)
    for r in rows[:40]:
        print(r, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parse":
        parse()
    else:
        capture()
        parse()
