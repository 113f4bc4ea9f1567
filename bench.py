"""Benchmark: decoder training throughput on the flagship config.

Prints ONE JSON line:
  {"metric": "decoder_train_frames_per_sec_per_chip", "value": N,
   "unit": "frames/s/chip", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); vs_baseline is therefore
reported against the driver's north star: measured MFU / 0.40 target MFU.
Extra context (sampling steps/s, MFU, batch) goes to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp

# v5e (TPU v5 lite) peak ~197 TFLOP/s bf16, ~98 TFLOP/s fp32.
PEAK_FLOPS = {
    "v5 lite": 197e12,
    "v5litepod": 197e12,
    "v4": 275e12,
    "v5p": 459e12,
    "v6 lite": 918e12,
}


def peak_flops_for(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    for k, v in PEAK_FLOPS.items():
        if k in kind:
            return v
    return 197e12


def wait_for_backend(max_wait_s: float = 2400, probe_timeout: float = 240) -> None:
    """The axon TPU backend has outages (CLAUDE.md): jax.devices() either
    hangs for tens of minutes or raises UNAVAILABLE, then recovers on its
    own. Probe it in a SUBPROCESS (so a hang can be timed out) and wait up
    to max_wait_s before touching the in-process backend; if it never comes
    back, fall through and let the real init raise."""
    import subprocess

    deadline = time.time() + max_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=probe_timeout, capture_output=True,
            )
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print("backend probe never succeeded; proceeding anyway",
                  file=sys.stderr)
            return
        print(f"backend probe {attempt} failed; retrying in 60s "
              f"(axon outage — see CLAUDE.md)", file=sys.stderr)
        time.sleep(60)


def main():
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    wait_for_backend()
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.device_kind})", file=sys.stderr)

    # B=16 is the single-chip sweet spot on v5e (B=32 OOMs at 22G/15.75G;
    # dominant costs: 2x lane-padding on dim-64 stage-0 tensors + tiny-context
    # cross-attn sim matrices — see docs/PERF.md)
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

    # NOTE: no donate_argnums — buffer donation trips an INVALID_ARGUMENT in
    # the axon TPU runtime (verified by bisection); cost is one extra state
    # copy per step
    step = jax.jit(
        lambda s, r: trainer.train_step(s, r, video, video_embed=emb),
    )

    # compile + flops accounting
    t0 = time.time()
    lowered = step.lower(state, jax.random.PRNGKey(3))
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    flops_per_step = float(cost.get("flops", 0.0)) if cost else 0.0
    print(f"compile: {time.time() - t0:.1f}s, XLA flops/step: {flops_per_step:.3e}",
          file=sys.stderr)

    # warmup. NOTE: block_until_ready can return before execution on the
    # axon runtime — force a device->host scalar transfer to truly drain.
    sync = lambda x: float(jax.device_get(x))
    key = jax.random.PRNGKey(4)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, loss = compiled(state, k)
    sync(loss)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        key, k = jax.random.split(key)
        state, loss = compiled(state, k)
    sync(loss)
    dt = (time.time() - t0) / iters

    frames_per_sec = B * T / dt
    mfu = flops_per_step / dt / peak_flops_for(dev) if flops_per_step else 0.0
    print(
        f"train step: {dt*1000:.1f} ms, loss={float(loss):.4f}, "
        f"frames/s/chip={frames_per_sec:.1f}, MFU={mfu*100:.1f}%",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "decoder_train_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(mfu / 0.40, 4),
    }))


if __name__ == "__main__":
    main()
