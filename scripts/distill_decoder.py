"""Progressive + guided distillation of the r2_curve base stage, scored.

Distills the 1000-T blob-video decoder (runs/r2_curve/last, the same
checkpoint the DDIM quality ladder in runs/eval_quality scored) through
halving phases — the FIRST phase evaluates the teacher WITH CFG
(cond_scale 2.0, the ladder's setting) so guidance folds into the
student; every later phase is pure progressive halving at cond_scale 1.

Per phase: fresh blob batches, jitted distill steps, EMA student; the
phase's EMA student becomes the next phase's teacher. Afterwards the
final students are scored with the SAME fixed-seed ViViT-FVD extractor,
held-out corpus, and anchors as scripts/eval_quality.py, so student-N
rows are directly comparable to the teacher's DDIM-N ladder — including
wall-clock, where the student also saves the 2x CFG batch.

Run:  nohup python scripts/distill_decoder.py > runs/distill.log 2>&1 &
      (resumable per phase: finished phases reload their checkpoint)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np

RUN = Path(sys.argv[sys.argv.index("--run") + 1]) \
    if "--run" in sys.argv else Path("runs/distill")
PHASES = (32, 16, 8, 4)  # student_steps per halving phase
STEPS_PER_PHASE = int(sys.argv[sys.argv.index("--steps") + 1]) \
    if "--steps" in sys.argv else 400
BATCH = 8
COND_SCALE = 2.0  # folded into the student during the first phase
LR = 1e-4
N_EVAL = 64
EVAL_BATCH = 16


def main():
    from eval_quality import build, save_grid, vivit_embed_fn
    from train_r2_curve import blob_videos

    from dalle2_video_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from dalle2_video_tpu.train.distill import DistillConfig, DistillTrainer
    from dalle2_video_tpu.utils.fvd import compute_fvd, fvd_from_features

    RUN.mkdir(parents=True, exist_ok=True)
    print("device:", jax.devices()[0].device_kind, flush=True)

    cfg, dec, trainer = build()
    state = trainer.init_state(jax.random.PRNGKey(0))
    state = load_checkpoint("runs/r2_curve/last", state)
    base_params = trainer.sampling_params(state, use_ema=True)
    teacher = base_params
    del state
    print("teacher loaded: runs/r2_curve/last (EMA)", flush=True)

    data_rng = np.random.RandomState(0)  # the training pool's stream
    results = {}
    if (RUN / "results.json").exists():
        results = json.loads((RUN / "results.json").read_text())

    def flush():
        (RUN / "results.json").write_text(json.dumps(results, indent=1))

    # ------------------------------------------------------------ phases
    # keep only the EMA tree per phase (a full DistillState would pin
    # adam moments for every phase in HBM)
    ema_by_steps = {}
    for phase_idx, steps in enumerate(PHASES):
        w = COND_SCALE if phase_idx == 0 else 1.0
        tr = DistillTrainer(
            dec,
            DistillConfig(student_steps=steps, teacher_cond_scale=w, lr=LR),
        )
        ck = RUN / f"student_{steps}"
        dstate = tr.init_state(teacher)
        if (ck / "done").exists():
            dstate = load_checkpoint(str(ck / "state"), dstate)
            print(f"phase {steps}: reloaded finished checkpoint", flush=True)
        else:
            step_fn = jax.jit(tr.distill_step)
            key = jax.random.PRNGKey(100 + phase_idx)
            t0 = time.time()
            losses = []
            pending = None
            for it in range(STEPS_PER_PHASE):
                vids, embs = blob_videos(data_rng, BATCH, 16, 64)
                key, k = jax.random.split(key)
                dstate, loss = step_fn(
                    dstate, teacher, k, jnp.asarray(vids),
                    video_embed=jnp.asarray(embs),
                )
                pending = loss  # sync once per log interval, not per step
                if (it + 1) % 50 == 0:
                    losses.append(float(pending))
                    print(
                        f"phase {steps} (w={w}) step {it + 1}: "
                        f"loss {losses[-1]:.4f} "
                        f"({(time.time() - t0) / (it + 1) * 1e3:.0f} ms/step)",
                        flush=True,
                    )
            save_checkpoint(str(ck / "state"), dstate)
            (ck / "done").write_text("ok")
            results[f"phase{steps}_losses"] = losses
            results[f"phase{steps}_ms_per_step"] = round(
                (time.time() - t0) / max(STEPS_PER_PHASE, 1) * 1e3, 1
            )  # --steps 0 = untrained-init control run (FVD scoring only)
            flush()
        ema_by_steps[steps] = dstate.ema
        # the EMA student is the next phase's teacher
        teacher = tr.student_decoder_params(dstate, teacher, use_ema=True)
        del dstate

    # ------------------------------------------------------------ scoring
    reals, embs = blob_videos(np.random.RandomState(123), N_EVAL, 16, 64)
    embed_fn, provenance = vivit_embed_fn(None)
    results.setdefault("extractor", provenance)
    feats_real = embed_fn(reals)
    half = N_EVAL // 2
    results["fvd_real_vs_real_splithalf"] = round(
        fvd_from_features(feats_real[:half], feats_real[half:]), 3
    )
    print("anchors:", results.get("fvd_real_vs_real_splithalf"), flush=True)
    flush()

    # score each student at ITS step count, cond_scale=1 (no CFG batch)
    for steps in PHASES:
        tag = f"student{steps}"
        if f"fvd_{tag}" in results:
            continue
        params_s = dict(base_params)
        params_s["unet_0"] = ema_by_steps[steps]
        dec_st = VideoDecoderAt(cfg, steps)
        t0 = time.time()
        fakes = []
        for s in range(0, N_EVAL, EVAL_BATCH):
            k = jax.random.PRNGKey(1000 + s)
            fakes.append(
                np.asarray(
                    dec_st.sample(
                        params_s, k,
                        video_embed=jnp.asarray(embs[s : s + EVAL_BATCH]),
                        cond_scale=1.0, stop_at_unet_number=1,
                    )
                )
            )
        fakes = np.concatenate(fakes, axis=0)
        dt = time.time() - t0
        fvd = fvd_from_features(feats_real, embed_fn(fakes))  # reals embedded once
        results[f"fvd_{tag}"] = round(fvd, 3)
        results[f"sample_s_{tag}"] = round(dt, 1)
        print(f"{tag}: FVD={fvd:.3f} ({dt:.0f}s for {N_EVAL})", flush=True)
        flush()
        if steps == PHASES[-1]:
            save_grid(RUN / f"grid_{tag}.png", fakes)

    print("distillation complete:", json.dumps(results), flush=True)


def VideoDecoderAt(cfg, steps):
    """Decoder with sample_timesteps pinned to the student grid."""
    import dataclasses

    from dalle2_video_tpu.engine.decoder import VideoDecoder

    return VideoDecoder(
        dataclasses.replace(cfg, sample_timesteps=(steps, steps))
    )


if __name__ == "__main__":
    main()
