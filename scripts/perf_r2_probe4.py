"""Round-2 perf probe #4: ablation decomposition of the fwd+bwd step.

The backward runs at 50 TF/s while XLA conv VJPs measure 66-90 TF/s
(probe3) — something non-conv eats ~100 ms. Ablate one subsystem at a
time from the bench-config fwd+bwd and read the deltas:

  fb_base          full model
  fb_skip_gn       GroupNorm statistics removed (affine+FiLM+SiLU kept)
  fb_no_midattn    attend_at_middle=False (joint t*h*w self-attention off)
  fb_no_crossattn  ResnetBlock3D cross-attention monkeypatched to identity
  fb_all_off       all three at once (conv skeleton + glue)

Run:  nohup python scripts/perf_r2_probe4.py > runs/perf_r2_probe4.log 2>&1 &
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

LOG = "runs/perf_r2_probe4.jsonl"
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


def measure_fb(name, *, skip_gn=False, no_midattn=False, no_crossattn=False):
    import dalle2_video_tpu.models.layers as L
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig

    orig_call = L.CrossAttention.__call__
    if no_crossattn:
        L.CrossAttention.__call__ = lambda self, x, context, mask=None: x * 0.0
    try:
        unet = UNet3DConfig(
            dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
            num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
            attend_at_middle=not no_midattn,
            groupnorm_impl="skip" if skip_gn else "xla",
        )
        cfg = VideoDecoderConfig(
            unets=(unet,), frame_sizes=(S,), frame_numbers=(T,),
            timesteps=1000, learned_variance=False,
        )
        dec = VideoDecoder(cfg)
        params = dec.init_params(jax.random.PRNGKey(0))
        video = jax.random.uniform(jax.random.PRNGKey(1), (B, T, S, S, 3))
        emb = jax.random.normal(jax.random.PRNGKey(2), (B, 512))

        def fwd_bwd(p, key):
            def lfn(unet_params):
                pp = dict(p)
                pp["unet_0"] = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
                    unet_params,
                )
                return dec.loss(pp, key, video, video_embed=emb,
                                compute_dtype=jnp.bfloat16)

            loss, g = jax.value_and_grad(lfn)(p["unet_0"])
            gn = sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                     for l in jax.tree_util.tree_leaves(g))
            return loss + gn * 1e-12

        t0 = time.time()
        compiled = jax.jit(fwd_bwd).lower(params, jax.random.PRNGKey(3)).compile()
        cost = compiled.cost_analysis()
        flops = float(cost.get("flops", 0.0)) if cost else 0.0
        print(f"{name}: compiled in {time.time()-t0:.0f}s", flush=True)
        out = compiled(params, jax.random.PRNGKey(4))
        sync(out)
        iters = 5
        t0 = time.time()
        for _ in range(iters):
            out = compiled(params, jax.random.PRNGKey(4))
        sync(out)
        record(name, (time.time() - t0) / iters * 1e3, flops=flops)
    finally:
        L.CrossAttention.__call__ = orig_call


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    measure_fb("fb_base")
    measure_fb("fb_skip_gn", skip_gn=True)
    measure_fb("fb_no_midattn", no_midattn=True)
    measure_fb("fb_no_crossattn", no_crossattn=True)
    measure_fb("fb_all_off", skip_gn=True, no_midattn=True, no_crossattn=True)
    print("probe4 complete", flush=True)


if __name__ == "__main__":
    main()
