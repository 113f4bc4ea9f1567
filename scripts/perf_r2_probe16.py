"""Round-2 perf probe #16: per-op profile of the FUSED megakernel step.

probe14 measured the fused Block3D step at 475.9 vs 253.1 ms XLA — loss
matches (kernel numerically right) so the 223 ms live somewhere in the
Pallas path. Same capture/parse as probe5, but with groupnorm_impl="fused",
to attribute time across: fused fwd conv+stats kernel, scale-silu
elementwise, GN-bwd streaming kernel, dx transposed-conv kernel, wgrad
kernel, and the HBM pad copies the bwd conv kernels still pay.

Run:  nohup python scripts/perf_r2_probe16.py > runs/perf_r2_probe16.log 2>&1 &
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

TRACE_DIR = "runs/trace_r2_fused"
LOG = "runs/perf_r2_probe16.jsonl"


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
        groupnorm_impl="fused",
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
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        space.ParseFromString(f.read())

    rows = []
    for plane in space.planes:
        if not ("TPU" in plane.name or "/device" in plane.name.lower()):
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        totals = defaultdict(float)
        counts = defaultdict(int)
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, str(ev.metadata_id))
                totals[(line.name, name)] += ev.duration_ps / 1e9
                counts[(line.name, name)] += 1
        for (line_name, name), ms in sorted(totals.items(), key=lambda kv: -kv[1])[:100]:
            rows.append({
                "plane": plane.name, "line": line_name, "op": name,
                "ms_total": round(ms, 3), "count": counts[(line_name, name)],
            })

    with open(LOG, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} rows to {LOG}", flush=True)
    for r in rows[:45]:
        print(r, flush=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parse":
        parse()
    else:
        capture()
        parse()
