"""Secondary benchmarks over the BASELINE.md config set (one JSON line each):

  decoder_train   — same as bench.py (frames/s/chip)
  sampling        — 16x64x64, 250-step DDPM ancestral decode (steps/s/chip)
  clip_step       — video-CLIP contrastive step (pairs/s/chip)
  preprocess      — 8 synthetic clips -> tokens + 16-frame 64x64 store (clips/s)
  prior           — diffusion-prior train step at the shipped config (embeds/s)

Usage: python scripts/bench_all.py [suite ...]   (default: all but decoder)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def emit(metric, value, unit, vs=0.0):
    print(json.dumps({"metric": metric, "value": round(float(value), 2),
                      "unit": unit, "vs_baseline": round(float(vs), 4)}))


def _sync(x):
    # axon async artifact: block_until_ready can return before execution
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def bench_sampling():
    """BASELINE: 16x64x64, 250-step ancestral decode, frames/s/chip —
    with an MFU/roofline decomposition (VERDICT r1 #4: 'speed-of-light'
    must be a number, not a slogan) and a DDIM-64 A/B."""
    from bench import peak_flops_for

    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig

    B, T, S, STEPS = 4, 16, 64, 250
    peak = peak_flops_for(jax.devices()[0])
    unet = UNet3DConfig(dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
                        num_resnet_blocks=2, attn_heads=16, attn_dim_head=32)

    def make(sample_timesteps=None):
        return VideoDecoder(VideoDecoderConfig(
            unets=(unet,), frame_sizes=(S,), frame_numbers=(T,),
            timesteps=STEPS, sample_timesteps=sample_timesteps,
            learned_variance=False, flash_attention_sampling=True,
            sample_compute_dtype="bfloat16",
        ))

    dec = make()
    params = dec.init_params(jax.random.PRNGKey(0))
    emb = jax.random.normal(jax.random.PRNGKey(1), (B, 512))

    run = jax.jit(lambda p, r: dec.sample_stage(
        0, p, r, batch_size=B, video_embed=emb, cond_scale=3.0))
    t0 = time.time()
    compiled = run.lower(params, jax.random.PRNGKey(2)).compile()
    _sync(compiled(params, jax.random.PRNGKey(2)))
    print(f"sampling compile+first: {time.time()-t0:.0f}s", file=sys.stderr)
    # roofline basis: XLA's cost_analysis undercounts lax.scan bodies, so
    # count ONE denoiser call (the scan body's compute) and multiply by the
    # step count (VERDICT r1 #4: the speed-of-light claim must be a number)
    xb = jnp.zeros((B, T, S, S, 3))
    tb = jnp.zeros((B,), jnp.int32)
    fwd = jax.jit(lambda p, x, t: dec._unet_apply(
        0, p["unet_0"], x, t, video_embed=emb, cond_scale=3.0))
    cost = fwd.lower(params, xb, tb).compile().cost_analysis()
    step_flops = float(cost.get("flops", 0.0)) if cost else 0.0
    total_flops = step_flops * STEPS
    t0 = time.time()
    out = compiled(params, jax.random.PRNGKey(3))
    _sync(out)
    dt = time.time() - t0
    mfu = total_flops / dt / peak if total_flops else 0.0
    print(
        f"sampling: {dt:.2f}s for {STEPS} steps x batch {B} (CFG 2x); "
        f"denoiser flops {step_flops:.3e}/step, "
        f"MFU {mfu*100:.1f}% of {peak/1e12:.0f} TF/s peak "
        f"=> speed-of-light would be {dt*mfu:.2f}s",
        file=sys.stderr,
    )
    emit("sampling_steps_per_sec", STEPS / dt, "denoise steps/s/chip")
    emit("sampling_frames_per_sec", B * T / dt, "frames/s/chip", mfu / 0.40)

    # DDIM-64 A/B: same model, 64-step eta=0 sampler
    dec_ddim = make(sample_timesteps=64)
    run_d = jax.jit(lambda p, r: dec_ddim.sample_stage(
        0, p, r, batch_size=B, video_embed=emb, cond_scale=3.0))
    t0 = time.time()
    compiled_d = run_d.lower(params, jax.random.PRNGKey(2)).compile()
    _sync(compiled_d(params, jax.random.PRNGKey(2)))
    print(f"ddim64 compile+first: {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    _sync(compiled_d(params, jax.random.PRNGKey(3)))
    dt_d = time.time() - t0
    print(f"ddim64: {dt_d:.2f}s ({B*T/dt_d:.1f} frames/s)", file=sys.stderr)
    emit("sampling_ddim64_frames_per_sec", B * T / dt_d, "frames/s/chip")

    # distilled-student configuration: 8-step DDIM, cond_scale=1 (no 2x
    # CFG batch) — the program a progressively distilled student runs
    # (train/distill.py; quality evidence: runs/distill FVD ladder)
    dec_s8 = make(sample_timesteps=8)
    run_s = jax.jit(lambda p, r: dec_s8.sample_stage(
        0, p, r, batch_size=B, video_embed=emb, cond_scale=1.0))
    t0 = time.time()
    compiled_s = run_s.lower(params, jax.random.PRNGKey(2)).compile()
    _sync(compiled_s(params, jax.random.PRNGKey(2)))
    print(f"student8 compile+first: {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    _sync(compiled_s(params, jax.random.PRNGKey(3)))
    dt_s = time.time() - t0
    print(f"distilled-8 (no CFG): {dt_s:.2f}s ({B*T/dt_s:.1f} frames/s)",
          file=sys.stderr)
    emit("sampling_distilled8_frames_per_sec", B * T / dt_s, "frames/s/chip")


def bench_clip():
    """BASELINE: video-CLIP contrastive step, pairs/s (batch 4, 16x64x64)."""
    from dalle2_video_tpu.models.clip_text import CLIPTextConfig
    from dalle2_video_tpu.models.vivit import ViViTConfig
    from dalle2_video_tpu.train.clip_trainer import ClipTrainer, ClipTrainerConfig

    B, T, S = 4, 16, 64
    vcfg = ViViTConfig(frame_size=S, patch_size=16, num_frames=25, dim=512,
                       depth=2, heads=8, dim_head=64)
    # num_frames must divide scale_dim_conv^2=25; use 25 frames >= T
    trainer = ClipTrainer(vcfg, CLIPTextConfig(), ClipTrainerConfig(total_steps=100))
    videos = jax.random.uniform(jax.random.PRNGKey(0), (B, 25, S, S, 3))
    tokens = jnp.ones((B, 77), jnp.int32)
    state = trainer.init_state(jax.random.PRNGKey(1), videos[:1])
    text_params = trainer.init_text_params(jax.random.PRNGKey(2))
    step = jax.jit(trainer.train_step)
    t0 = time.time()
    state, m = step(state, text_params, videos, tokens)
    jax.block_until_ready(m["loss"])
    print(f"clip compile+first: {time.time()-t0:.0f}s", file=sys.stderr)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        state, m = step(state, text_params, videos, tokens)
    jax.block_until_ready(m["loss"])
    dt = (time.time() - t0) / iters
    print(f"clip step: {dt*1000:.0f}ms", file=sys.stderr)
    # reference anecdote: ~0.9 pairs/s (README.md:14 derivation, BASELINE.md)
    emit("clip_pairs_per_sec", B / dt, "pairs/s/chip", (B / dt) / 0.9)


def bench_prior(B=256, D=512, depth=6, iters=20):
    """Prior train step at the shipped config (dim 512, depth 6, batch 256 —
    configs/celebv_text.yaml): embeds/s/chip. The reference never shipped a
    prior trainer, so there is no baseline to normalize against (vs=0).
    (Defaults are the TPU geometry; tests drive a tiny one on CPU.)"""
    import optax

    from dalle2_video_tpu.models.prior import (
        DiffusionPrior, DiffusionPriorConfig, PriorNetworkConfig,
    )

    prior = DiffusionPrior(DiffusionPriorConfig(
        network=PriorNetworkConfig(dim=D, depth=depth, heads=8, dim_head=64),
        timesteps=1000,
    ))
    params = prior.init_params(jax.random.PRNGKey(0))
    opt = optax.adam(3e-4)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, key, ve, te):
        loss, grads = jax.value_and_grad(
            lambda p: prior.loss(p, key, ve, te))(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    ve = jax.random.normal(jax.random.PRNGKey(1), (B, D))
    te = jax.random.normal(jax.random.PRNGKey(2), (B, D))
    key = jax.random.PRNGKey(3)
    t0 = time.time()
    params, opt_state, loss = step(params, opt_state, key, ve, te)
    _sync(loss)
    print(f"prior compile+first: {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, key, ve, te)
    _sync(loss)
    dt = (time.time() - t0) / iters
    print(f"prior step: {dt*1000:.1f}ms", file=sys.stderr)
    emit("prior_embeds_per_sec", B / dt, "embeds/s/chip")


def bench_preprocess():
    """BASELINE: 8 clips -> tokenized texts + 16-frame 64x64 store (CPU)."""
    import tempfile

    import cv2

    from dalle2_video_tpu.data.preprocess import PreprocessConfig, run

    tmp = Path(tempfile.mkdtemp())
    (tmp / "texts/face40_details_new").mkdir(parents=True)
    (tmp / "videos").mkdir()
    for i in range(8):
        (tmp / f"texts/face40_details_new/c{i}.txt").write_text(f"a person {i}")
        vw = cv2.VideoWriter(str(tmp / f"videos/c{i}.mp4"),
                             cv2.VideoWriter_fourcc(*"mp4v"), 16, (128, 128))
        r = np.random.RandomState(i)
        for _ in range(16):
            vw.write(r.randint(0, 255, (128, 128, 3), np.uint8))
        vw.release()
    t0 = time.time()
    count, _, _ = run(PreprocessConfig(
        texts_root=str(tmp / "texts"), videos_root=str(tmp / "videos"),
        out_h5=str(tmp / "v.vshard"), out_tokens=str(tmp / "t.npy"),
        seq_len=1, fps=16, frame_size=64, normalize=False))
    dt = time.time() - t0
    emit("preprocess_clips_per_sec", count / dt, "clips/s (cpu)")


def _cascade_decoder():
    """BASELINE target #5 geometry: 16x64x64 -> 64x128x128 Imagen-Video-
    style temporal+spatial SR cascade (configs/cascade_sr.yaml; the
    reference could not run its cascade at all — README.md:10: ZeRO-3
    OOM at batch_size=1 — so vs_baseline has no denominator).

    The SR unet trains on (T=64, 128x128) activations — 16x the flagship
    frame-volume per sample — so it rides the two capacity knobs that the
    r4 remat sweep quantified (evidence/perf_r4/remat_sweep.jsonl):
    remat_policy="nothing" (peak 14.4 -> 8.6 GB on the flagship step) and
    memory_efficient=True (downsample-first, full-res convs avoided)."""
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig
    from dalle2_video_tpu.models import UNet3DConfig

    T2, S2 = 64, 128
    unet1 = UNet3DConfig(dim=64, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
                         num_resnet_blocks=2, attn_heads=16, attn_dim_head=32)
    # SR stage: joint attention sits at 64*16*16 = 16384 tokens — ride the
    # Pallas flash-MQA path ("auto" picks it >= 4096 tokens on TPU)
    # CASCADE_REMAT_POLICY lets a queue A/B the policy without a code
    # edit ("conv" peaks at 10.75 vs "nothing"'s 8.6 GB on the flagship
    # but recomputes less — r4 sweep). r5 A/B on THIS step: conv fits at
    # B=4 and is 5% faster (285.5 vs 300.5 ms,
    # evidence/perf_r4/cascade_remat_ab.jsonl) -> conv is the default.
    unet2 = UNet3DConfig(dim=32, dim_mults=(1, 2, 4, 8), video_embed_dim=512,
                         num_resnet_blocks=2, attn_heads=16, attn_dim_head=32,
                         attention_impl="auto", memory_efficient=True,
                         checkpoint_during_training=True,
                         remat_policy=os.environ.get(
                             "CASCADE_REMAT_POLICY", "conv"))
    dec = VideoDecoder(VideoDecoderConfig(
        unets=(unet1, unet2), frame_sizes=(64, S2), frame_numbers=(16, T2),
        timesteps=1000, sample_timesteps=(64, 64), learned_variance=False,
        flash_attention_sampling=True, sample_compute_dtype="bfloat16",
    ))
    return dec, T2, S2


def bench_cascade_sr():
    """SR-stage train step (frames/s/chip over output frames). Multi-chip
    GSPMD data-parallel of the same step is exercised by
    __graft_entry__.dryrun_multichip; this records the per-chip rate.
    Run as its own process (queue job): a train-step OOM can wedge the
    axon device state for everything after it (observed r4: even
    PRNGKey raised RESOURCE_EXHAUSTED after two OOMs). For the same
    reason each batch-size attempt runs in its OWN subprocess (ADVICE
    r4: an in-process B=2 retry after a B=4 OOM can fail from the wedge,
    not genuine OOM); CASCADE_SR_BATCH=<B> pins a single in-process
    attempt (the child mode, also handy for queue A/Bs)."""
    b_env = os.environ.get("CASCADE_SR_BATCH")
    if b_env is None:
        import subprocess
        for B in (4, 2, 1):
            env = dict(os.environ, CASCADE_SR_BATCH=str(B))
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__), "cascade_sr"],
                env=env)
            if rc == 0:
                return
            print(f"cascade sr train B={B} subprocess failed rc={rc}",
                  file=sys.stderr)
        raise SystemExit("cascade sr train OOM at every batch size")

    from bench import peak_flops_for

    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    dec, T2, S2 = _cascade_decoder()
    trainer = DecoderTrainer(
        dec, DecoderTrainerConfig(lr=3e-4, use_ema=True, bf16_compute=True)
    )
    state = trainer.init_state(jax.random.PRNGKey(0))
    peak = peak_flops_for(jax.devices()[0])

    # --- SR-stage train step (configs/cascade_sr.yaml decoder.batch_size) --
    B = int(b_env)
    video = jax.random.uniform(jax.random.PRNGKey(1), (B, T2, S2, S2, 3))
    emb = jax.random.normal(jax.random.PRNGKey(2), (B, 512))
    step = jax.jit(lambda s, r: trainer.train_step(
        s, r, video, video_embed=emb, unet_number=2))
    t0 = time.time()
    compiled = step.lower(state, jax.random.PRNGKey(3)).compile()
    cost = compiled.cost_analysis()
    flops = float(cost.get("flops", 0.0)) if cost else 0.0
    print(f"cascade sr train compile: {time.time()-t0:.0f}s "
          f"(B={B})", file=sys.stderr)
    st = state
    for _ in range(2):
        st, loss = compiled(st, jax.random.PRNGKey(4))
    _sync(loss)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        st, loss = compiled(st, jax.random.PRNGKey(4))
    _sync(loss)
    dt = (time.time() - t0) / iters
    mfu = flops / dt / peak if flops else 0.0
    print(f"cascade sr train: {dt*1000:.1f} ms (B={B}), "
          f"MFU {mfu*100:.1f}%", file=sys.stderr)
    emit("cascade_sr_train_frames_per_sec", B * T2 / dt,
         "frames/s/chip", mfu / 0.40)


def bench_cascade_e2e():
    """End-to-end two-stage sample: base DDIM-64 -> SR DDIM-64, batch 1,
    bf16 denoiser. Params only (dec.init_params) — no optimizer/EMA in
    HBM; sampling is the serving configuration."""
    dec, T2, S2 = _cascade_decoder()
    params = dec.init_params(jax.random.PRNGKey(0))
    emb1 = jax.random.normal(jax.random.PRNGKey(5), (1, 512))
    sample = lambda r: dec.sample(
        params, r, video_embed=emb1, batch_size=1, cond_scale=3.0,
        jit_stages=True,  # one cached program per stage (CLAUDE.md: one
        # big jit trips the remote-compile size limit)
    )
    t0 = time.time()
    out = sample(jax.random.PRNGKey(6))
    _sync(out)
    print(f"cascade e2e compile+first: {time.time()-t0:.0f}s", file=sys.stderr)
    t0 = time.time()
    out = sample(jax.random.PRNGKey(7))
    _sync(out)
    dt = time.time() - t0
    assert out.shape == (1, T2, S2, S2, 3), out.shape
    print(f"cascade e2e: {dt:.2f}s -> {T2/dt:.2f} frames/s", file=sys.stderr)
    emit("cascade_e2e_frames_per_sec", T2 / dt, "frames/s/chip")


def bench_cascade():
    bench_cascade_sr()
    bench_cascade_e2e()


SUITES = {
    "sampling": bench_sampling,
    "clip": bench_clip,
    "preprocess": bench_preprocess,
    "prior": bench_prior,
    "cascade": bench_cascade,
    "cascade_sr": bench_cascade_sr,
    "cascade_e2e": bench_cascade_e2e,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["preprocess", "clip", "sampling", "prior", "cascade"]
    for n in names:
        SUITES[n]()
