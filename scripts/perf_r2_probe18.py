"""Round-2 perf probe #18: XLA flag sweep on the bench train step.

After probes 1-17 every graph-level and Pallas substitution lost to XLA's
defaults; the last untried lever is the compiler's own knobs. Each variant
runs in a SUBPROCESS (a bad/unknown flag then fails that variant only) with
XLA_FLAGS set before backend init, measuring the bench-identical B=16
trainer step.

Run:  nohup python scripts/perf_r2_probe18.py > runs/perf_r2_probe18.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LOG = os.path.join(REPO, "runs/perf_r2_probe18.jsonl")

CHILD = r"""
import json, sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, %r)
from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
from dalle2_video_tpu.models import UNet3DConfig
from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

B, T, S = 16, 16, 64
unet = UNet3DConfig(dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
                    num_resnet_blocks=2, attn_heads=16, attn_dim_head=32)
cfg = VideoDecoderConfig(unets=(unet,), frame_sizes=(S,), frame_numbers=(T,),
                         timesteps=1000, learned_variance=False)
trainer = DecoderTrainer(VideoDecoder(cfg),
                         DecoderTrainerConfig(lr=3e-4, use_ema=True, bf16_compute=True))
state = trainer.init_state(jax.random.PRNGKey(0))
video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, S, S, 3))
emb = jax.random.normal(jax.random.PRNGKey(2), (B, 512))
step = jax.jit(lambda s, r: trainer.train_step(s, r, video, video_embed=emb))
t0 = time.time()
compiled = step.lower(state, jax.random.PRNGKey(3)).compile()
print(f"compiled in {time.time()-t0:.0f}s", file=sys.stderr, flush=True)
key = jax.random.PRNGKey(4)
for _ in range(3):
    key, k = jax.random.split(key)
    state, loss = compiled(state, k)
float(jax.device_get(loss))
t0 = time.time()
for _ in range(10):
    key, k = jax.random.split(key)
    state, loss = compiled(state, k)
float(jax.device_get(loss))
dt = (time.time() - t0) / 10
print(json.dumps({"ms": round(dt * 1e3, 2), "loss": float(loss)}))
""" % (REPO,)

VARIANTS = [
    ("control", ""),
    ("vmem32m", "--xla_tpu_scoped_vmem_limit_kib=32768"),
    ("vmem64m", "--xla_tpu_scoped_vmem_limit_kib=65536"),
]


def main():
    for name, flags in VARIANTS:
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        print(f"=== {name}: XLA_FLAGS={flags!r}", flush=True)
        r = subprocess.run([sys.executable, "-c", CHILD], env=env,
                           capture_output=True, text=True, timeout=3600)
        row = {"name": f"fl18_{name}", "flags": flags}
        if r.returncode == 0 and r.stdout.strip():
            row.update(json.loads(r.stdout.strip().splitlines()[-1]))
        else:
            row["error"] = (r.stderr or "")[-500:]
        with open(LOG, "a") as f:
            f.write(json.dumps(row) + "\n")
        print("RESULT", json.dumps(row), flush=True)
    print("probe18 complete", flush=True)


if __name__ == "__main__":
    main()
