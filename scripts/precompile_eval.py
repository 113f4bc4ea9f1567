"""Warm the persistent compile cache for the distill-eval and inpaint
sampling programs (r5 companion to precompile_distill.py).

distill_decoder.py / demo_inpaint.py call ``decoder.sample`` un-jitted;
the denoising loop is one ``lax.scan``, so each (sample_timesteps,
cond_scale, inpaint-mask-shape, inpaint-method) variant is one big
implicit XLA compile (~10-20 min each on a cold cache, serialized inside
those jobs). This script executes the SAME call sites with zero-valued
params (numerics irrelevant — only the compiled program matters) so the
programs land in the persistent compile cache while the distill job is
still stepping its phases.

Ordering matters: the distill job evaluates students 32 -> 16 -> 8 -> 4,
and compiles 32 itself first; we warm in reverse need order (4, 8, 16),
then the three demo_inpaint programs (extend/interp share one program —
same mask SHAPE; spatial and guided differ).

Run concurrently with the distill job:
    nice -n 19 python scripts/precompile_eval.py

MEASURED OUTCOME (r5): unnecessary against a busy chip. The un-jitted
sampling scans compile in ~1-3 min (student32 eval: 185 s INCLUDING its
compile), unlike the 15-20 min train-step programs, and this script's
zero-param executions starved behind the distill job's continuous device
stream (no output in 32 min; killed). Keep for warming inpaint/sampling
programs on an IDLE chip; prefer precompile_distill.py (AOT, no
execution) when the chip is busy.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from eval_quality import build

    cfg, dec, trainer = build()
    # zero params with the exact sampling-tree structure/dtypes
    teacher_abs = jax.eval_shape(
        lambda k: trainer.sampling_params(trainer.init_state(k), use_ema=True),
        jax.random.PRNGKey(0),
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), teacher_abs
    )
    B = 16  # distill_decoder EVAL_BATCH == demo_inpaint BATCH
    emb = jnp.zeros((B, 512), jnp.float32)
    k = jax.random.PRNGKey(0)

    def done(x, tag, t0):
        np.asarray(x[:1, :1, :1, :1])  # force execution
        print(f"{tag}: compiled+cached in {time.time() - t0:.0f}s", flush=True)

    # distill/dry-baseline student evals (cond_scale=1.0, no inpaint)
    for steps in (4, 8, 16):
        dec_st = type(dec)(dataclasses.replace(
            cfg, sample_timesteps=(steps, steps)))
        t0 = time.time()
        out = dec_st.sample(params, k, video_embed=emb, cond_scale=1.0,
                            stop_at_unet_number=1)
        done(out, f"eval ddim-{steps}", t0)

    # demo_inpaint programs: DDIM-64, cond_scale=2.0, B=16, stage 1
    dec64 = type(dec)(dataclasses.replace(cfg, sample_timesteps=(64, 64)))
    vid = jnp.zeros((B, 16, 64, 64, 3), jnp.float32)
    mask_t = jnp.zeros((1, 16, 1, 1, 1), jnp.float32)   # extend/interp
    mask_s = jnp.zeros((1, 1, 64, 64, 1), jnp.float32)  # spatial
    for tag, mask, method in (
        ("inpaint temporal replace", mask_t, "replace"),
        ("inpaint spatial replace", mask_s, "replace"),
        ("inpaint temporal guided", mask_t, "guided"),
    ):
        t0 = time.time()
        out = dec64.sample(params, k, video_embed=emb, cond_scale=2.0,
                           stop_at_unet_number=1, inpaint_video=vid,
                           inpaint_mask=mask, inpaint_method=method)
        done(out, tag, t0)
    print("eval precompile complete", flush=True)


if __name__ == "__main__":
    main()
