"""Round-5: decompose the e2e cascade sample and land a distilled-cascade
rate (VERDICT r4 #4 — the 1.78 s / 35.9 f/s row had no stage breakdown
and the distilled students were never dropped into the cascade).

Modes (one queue job each):

  stage_shares  bench_all._cascade_decoder config — the exact program set
                behind the 35.9 f/s witness — with init params (stage
                timing is weight-independent): times base-only
                (stop_at_unet_number=1), full e2e, and SR-from-base
                (start_at_unet_number=2, includes the host-side nearest
                resize) -> base / SR / host-overhead shares of the e2e
                second.

  distilled     the r2_curve recipe (eval_quality.build) with the
                distilled base student (runs/distill/student_8) and the
                distilled SR student (runs/distill_sr/state) swapped in,
                sample_timesteps=(8,8), vs the teacher at (64,64) on the
                SAME config/batch — the serving payoff of
                train/distill.py measured end to end. Needs the queue's
                distill_decoder + distill_sr_demo jobs to have run.

Writes evidence/perf_r5/e2e_breakdown.jsonl.
Reference: the cascade sampler this decomposes re-designs
/root/reference/dalle2_video/dalle2_video.py:2102-2177 (sample());
the reference has no distillation at all.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp

OUT_DIR = "evidence/perf_r5"
LOG = os.path.join(OUT_DIR, "e2e_breakdown.jsonl")


def record(**row):
    os.makedirs(OUT_DIR, exist_ok=True)
    with open(LOG, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("RESULT", json.dumps(row), flush=True)


def _sync(x):
    return float(jax.device_get(jnp.sum(x.astype(jnp.float32))))


def _timed(fn, warm: int = 1, iters: int = 3):
    """Compile+warm, then median-free mean of `iters` timed runs."""
    out = None
    for _ in range(warm):
        out = fn()
        _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn()
        _sync(out)
    return (time.time() - t0) / iters, out


def stage_shares():
    from bench_all import _cascade_decoder

    dec, T2, S2 = _cascade_decoder()
    params = dec.init_params(jax.random.PRNGKey(0))
    emb = jax.random.normal(jax.random.PRNGKey(5), (1, 512))

    t_base, base_out = _timed(lambda: dec.sample(
        params, jax.random.PRNGKey(6), video_embed=emb, batch_size=1,
        cond_scale=3.0, jit_stages=True, stop_at_unet_number=1))
    print(f"base-only: {t_base:.3f}s", flush=True)

    t_full, _ = _timed(lambda: dec.sample(
        params, jax.random.PRNGKey(6), video_embed=emb, batch_size=1,
        cond_scale=3.0, jit_stages=True))
    print(f"full e2e: {t_full:.3f}s", flush=True)

    t_sr, _ = _timed(lambda: dec.sample(
        params, jax.random.PRNGKey(6), video_embed=emb, batch_size=1,
        cond_scale=3.0, jit_stages=True, start_at_unet_number=2,
        video=base_out))
    print(f"SR-from-base (incl host resize): {t_sr:.3f}s", flush=True)

    record(name="cascade_stage_shares", config="bench_all._cascade_decoder",
           batch=1, steps="ddim64/ddim64",
           base_s=round(t_base, 3), full_s=round(t_full, 3),
           sr_incl_resize_s=round(t_sr, 3),
           sr_in_cascade_s=round(t_full - t_base, 3),
           host_resize_s=round(t_base + t_sr - t_full, 3),
           base_share_pct=round(t_base / t_full * 100, 1),
           sr_share_pct=round((t_full - t_base) / t_full * 100, 1),
           frames_per_s=round(T2 / t_full, 1))


def distilled():
    from eval_quality import build

    from dalle2_video_tpu.engine.decoder import VideoDecoder
    from dalle2_video_tpu.train.checkpoint import load_checkpoint
    from dalle2_video_tpu.train.distill import DistillConfig, DistillTrainer

    cfg, dec, trainer = build()
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = load_checkpoint("runs/r2_curve/last", state)
    teacher = trainer.sampling_params(state, use_ema=True)
    del state
    emb = jax.random.normal(jax.random.PRNGKey(5), (1, 512))

    # teacher e2e at the quality ladder's (64, 64)
    t_teacher, _ = _timed(lambda: dec.sample(
        teacher, jax.random.PRNGKey(6), video_embed=emb, batch_size=1,
        cond_scale=1.0, jit_stages=True))
    T2 = cfg.frame_numbers[-1]
    print(f"teacher 64/64 e2e: {t_teacher:.3f}s", flush=True)

    # distilled params: base student_8 EMA + SR student EMA
    params_d = dict(teacher)
    tr_b = DistillTrainer(dec, DistillConfig(student_steps=8, unet_number=1))
    dstate_b = tr_b.init_state(teacher)
    dstate_b = load_checkpoint("runs/distill/student_8/state", dstate_b)
    params_d["unet_0"] = dstate_b.ema
    del dstate_b
    tr_s = DistillTrainer(dec, DistillConfig(student_steps=8, unet_number=2))
    dstate_s = tr_s.init_state(teacher)
    dstate_s = load_checkpoint("runs/distill_sr/state", dstate_s)
    params_d["unet_1"] = dstate_s.ema
    del dstate_s

    dec8 = VideoDecoder(dataclasses.replace(cfg, sample_timesteps=(8, 8)))
    t_student, out = _timed(lambda: dec8.sample(
        params_d, jax.random.PRNGKey(6), video_embed=emb, batch_size=1,
        cond_scale=1.0, jit_stages=True))
    assert out.shape[1] == T2, out.shape
    print(f"distilled 8/8 e2e: {t_student:.3f}s", flush=True)

    record(name="cascade_distilled_e2e", config="r2_curve recipe", batch=1,
           teacher_steps="64/64", student_steps="8/8",
           teacher_s=round(t_teacher, 3), student_s=round(t_student, 3),
           teacher_frames_per_s=round(T2 / t_teacher, 1),
           student_frames_per_s=round(T2 / t_student, 1),
           speedup=round(t_teacher / t_student, 2))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "stage_shares"
    print(f"device: {jax.devices()[0].device_kind}; mode {mode}", flush=True)
    {"stage_shares": stage_shares, "distilled": distilled}[mode]()
    print(f"{mode} complete", flush=True)


if __name__ == "__main__":
    main()
