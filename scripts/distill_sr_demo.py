"""SR-stage distillation witness (r4): distill the r2_curve cascade's
lowres-conditioned SR unet and show the progressive-distillation claim
directly in pixel space — no feature extractor needed.

The claim: after distillation, the student's 8-step DDIM SR output is
CLOSER to the teacher's 64-step reference than the teacher's own 8-step
output is, on the SAME base-stage video and the SAME sampling keys (DDIM
is deterministic given z_T, so PSNR against the 64-step reference is a
pure few-step-fidelity metric).

Needs runs/r2_curve/last (scripts/train_r2_curve.py). Artifacts in
runs/distill_sr/: results.json + grid PNGs (mirrored into evidence/ by
collect_evidence.py).

Usage: python scripts/distill_sr_demo.py [--steps N]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

RUN = Path("runs/distill_sr")
STEPS = int(sys.argv[sys.argv.index("--steps") + 1]) \
    if "--steps" in sys.argv else 300
B_TRAIN = 1          # SR geometry (64f x 128px); distill step holds 3 fwd
B_EVAL = 2
STUDENT_STEPS = 8    # the few-step grid the student will sample with
REF_STEPS = 64       # "ground truth" many-step teacher reference


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return float(-10.0 * np.log10(max(mse, 1e-12)))


def main() -> None:
    from eval_quality import build, save_grid
    from train_r2_curve import blob_videos

    from dalle2_video_tpu.engine.decoder import VideoDecoder
    from dalle2_video_tpu.train.checkpoint import load_checkpoint
    from dalle2_video_tpu.train.distill import DistillConfig, DistillTrainer

    RUN.mkdir(parents=True, exist_ok=True)
    print("device:", jax.devices()[0].device_kind, flush=True)

    cfg, dec, trainer = build()
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = load_checkpoint("runs/r2_curve/last", state)
    teacher = trainer.sampling_params(state, use_ema=True)
    del state, trainer

    tr = DistillTrainer(
        dec, DistillConfig(student_steps=STUDENT_STEPS, unet_number=2)
    )
    dstate = tr.init_state(teacher)
    step = jax.jit(tr.distill_step)

    data_rng = np.random.RandomState(7)
    key = jax.random.PRNGKey(42)
    losses = []
    t0 = time.time()
    for i in range(STEPS):
        video, emb = blob_videos(data_rng, B_TRAIN, 64, 128)
        dstate, loss = step(
            dstate, teacher, jax.random.fold_in(key, i),
            jnp.asarray(video), video_embed=jnp.asarray(emb),
        )
        losses.append(float(loss))
        if i % 50 == 0:
            print(f"step {i}: loss {losses[-1]:.5f} "
                  f"({(time.time() - t0) / (i + 1):.2f} s/step)", flush=True)
    train_s = time.time() - t0
    # persist the student so downstream jobs (perf_r5_e2e_breakdown.py
    # distilled) can drop it into the full cascade without retraining
    from dalle2_video_tpu.train.checkpoint import save_checkpoint
    save_checkpoint(str(RUN / "state"), dstate)

    # ------------------------------------------------------------ eval
    # same base video + same SR sampling key for all three variants
    _, eval_emb = blob_videos(np.random.RandomState(123), B_EVAL, 16, 64)
    eval_emb = jnp.asarray(eval_emb)
    k_base, k_sr = jax.random.split(jax.random.PRNGKey(9))
    base = dec.sample(
        teacher, k_base, video_embed=eval_emb, batch_size=B_EVAL,
        cond_scale=1.0, stop_at_unet_number=1, jit_stages=True,
    )
    base = jax.block_until_ready(base)

    def sr(params, n_steps):
        d = VideoDecoder(
            dataclasses.replace(cfg, sample_timesteps=(64, n_steps))
        )
        fn = jax.jit(
            lambda p, r, prev, emb: d.sample_stage(
                1, p, r, batch_size=B_EVAL, prev_video=prev,
                video_embed=emb, cond_scale=1.0,
            )
        )
        t = time.time()
        out = np.asarray(jax.block_until_ready(fn(params, k_sr, base, eval_emb)))
        return out, time.time() - t

    ref64, s_ref = sr(teacher, REF_STEPS)
    teacher8, s_t8 = sr(teacher, STUDENT_STEPS)
    student_params = tr.student_decoder_params(dstate, teacher)
    student8, s_s8 = sr(student_params, STUDENT_STEPS)

    results = {
        "steps_trained": STEPS,
        "student_steps": STUDENT_STEPS,
        "ref_steps": REF_STEPS,
        "loss_first10_mean": float(np.mean(losses[:10])),
        "loss_last10_mean": float(np.mean(losses[-10:])),
        "train_s": round(train_s, 1),
        "psnr_teacher8_vs_ref64": round(psnr(teacher8, ref64), 3),
        "psnr_student8_vs_ref64": round(psnr(student8, ref64), 3),
        "sr_sample_s": {"ref64": round(s_ref, 1),
                        "teacher8": round(s_t8, 1),
                        "student8": round(s_s8, 1)},
    }
    (RUN / "results.json").write_text(json.dumps(results, indent=1))
    save_grid(RUN / "grid_sr_student8.png", student8)
    save_grid(RUN / "grid_sr_ref64.png", ref64)
    print("RESULT", json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
