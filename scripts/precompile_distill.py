"""Warm the persistent compile cache for distill phases 2-4 (r5).

scripts/distill_decoder.py recompiles its jitted distill step once per
halving phase: the DDIM segment grids (t_starts/t_mids/t_ends) are
closed-over constants whose LENGTH is student_steps, so phases 32/16/8/4
are four distinct XLA programs at ~15-20 min remote compile each on a
cold cache. This script AOT-lowers the SAME programs (same builders,
same shapes/dtypes via jax.eval_shape — no checkpoint, no device
execution, no HBM activations) so they land in the persistent compile
cache while an earlier phase is still stepping on the chip.

Run concurrently with the distill job (it only compiles, never steps):
    nice -n 19 python scripts/precompile_distill.py 16 8 4
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp


def main() -> None:
    from eval_quality import build
    from dalle2_video_tpu.train.distill import DistillConfig, DistillTrainer

    phases = [int(a) for a in sys.argv[1:]] or [16, 8, 4]
    cfg, dec, trainer = build()
    key = jax.random.PRNGKey(0)
    # teacher tree shapes exactly as distill_decoder builds them
    teacher_abs = jax.eval_shape(
        lambda k: trainer.sampling_params(trainer.init_state(k), use_ema=True),
        key,
    )
    vids = jax.ShapeDtypeStruct((8, 16, 64, 64, 3), jnp.float32)
    embs = jax.ShapeDtypeStruct((8, 512), jnp.float32)

    for steps in phases:
        # phases 2-4 all run with teacher_cond_scale=1.0 (distill_decoder:
        # COND_SCALE folds in during phase 1 only) and LR=1e-4
        tr = DistillTrainer(
            dec, DistillConfig(student_steps=steps, teacher_cond_scale=1.0,
                               lr=1e-4)
        )
        dstate_abs = jax.eval_shape(tr.init_state, teacher_abs)
        t0 = time.time()
        jax.jit(tr.distill_step).lower(
            dstate_abs, teacher_abs, key, vids, video_embed=embs
        ).compile()
        print(f"phase {steps}: compiled+cached in {time.time() - t0:.0f}s",
              flush=True)
    print("precompile complete", flush=True)


if __name__ == "__main__":
    main()
