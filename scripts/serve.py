"""Production serving entry point: text -> video over HTTP.

Builds the same prior+decoder stack as scripts/sample.py, wraps it in the
continuous micro-batching GenerationEngine (static batch buckets, warmup
pre-compile), and serves the JSON API from dalle2_video_tpu.serve.

    python scripts/serve.py configs/celebv_text.yaml \
        serve_port=8000 serve_buckets=[1,2,4] cond_scale=3.0 warmup=true

Endpoints: POST /v1/generate {"prompt": ...}, GET /healthz, GET /v1/stats.
The reference repo has no serving story at all — this is the deployment
surface for the framework (see dalle2_video_tpu/serve/).
"""

from __future__ import annotations

import functools
import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def build_generate_batch(cfg, log):
    """Returns generate_batch(prompts, seeds, *, cond_scale, ddim_steps)
    over the trained stack (same checkpoint resolution as scripts/sample.py)."""
    from dalle2_video_tpu.data.tokenizer import tokenize
    from dalle2_video_tpu.engine.dalle2video import DALLE2Video
    from dalle2_video_tpu.models.clip_text import (
        CLIPTextConfig,
        CLIPTextEncoder,
    )
    from dalle2_video_tpu.models.prior import prior_from_config
    from dalle2_video_tpu.train.checkpoint import (
        has_checkpoint, load_best, load_params_subtree,
    )
    from scripts.train_decoder import build_decoder, build_trainer

    rng = jax.random.PRNGKey(int(cfg.get("sample_seed", 0)))
    k_text, k_init = jax.random.split(rng)

    text_enc = CLIPTextEncoder(CLIPTextConfig(embed_dim=cfg["dim"]))
    probe_tokens = jnp.asarray(tokenize(["warmup"]))
    openai = cfg["clip"].get("openai_ckpt")
    if openai:
        from dalle2_video_tpu.models.clip_text import load_openai_clip_text_params

        text_params = load_openai_clip_text_params(openai)
    else:
        log.warning("no OpenAI ckpt — random text tower (smoke mode)")
        text_params = text_enc.init(k_text, probe_tokens)

    # ONE factory shared with train_prior/sample so layout-affecting knobs
    # (scan_layers, ff_experts) always match the checkpoint
    prior = prior_from_config(cfg)
    prior_params = prior.init_params(k_init)
    prior_ckpt = Path(cfg["run_dir"]) / f"prior_{cfg['train_name']}"
    if has_checkpoint(str(prior_ckpt)):
        # layout-agnostic: train_prior saves FULL training state (resume
        # support); serving wants just the params subtree
        prior_params = load_params_subtree(str(prior_ckpt), prior_params)
        log.info("loaded prior %s", prior_ckpt)

    decoder = build_decoder(cfg)
    trainer = build_trainer(cfg, decoder)
    state = trainer.init_state(jax.random.PRNGKey(0))
    dec_ckpt = Path(cfg["run_dir"]) / f"decoder_{cfg['train_name']}"
    if has_checkpoint(str(dec_ckpt)):
        state = load_best(str(dec_ckpt), state)
        log.info("loaded decoder %s", dec_ckpt)
    dec_params = trainer.sampling_params(state)

    # optional distilled-student deployment (train/distill.py): swap the
    # progressive-distillation student into its cascade slot and pin that
    # stage's DDIM grid to the student's step count. Students fold CFG in
    # (teacher_cond_scale at distill time), so serve with cond_scale=1 —
    # the sampler then runs a single (no 2x CFG) batch per denoise step.
    #   serve_distill: {ckpt: runs/distill/student_4/state, steps: 4, unet: 1}
    dist = cfg.get("serve_distill")
    if dist:
        from dalle2_video_tpu.train.distill import (
            DistillConfig,
            DistillTrainer,
        )
        from dalle2_video_tpu.train.checkpoint import load_checkpoint

        steps = int(dist["steps"])
        unet_no = int(dist.get("unet", 1))
        tr = DistillTrainer(
            decoder,
            DistillConfig(student_steps=steps, unet_number=unet_no),
        )
        dstate = tr.init_state(dec_params)
        dstate = load_checkpoint(str(dist["ckpt"]), dstate)
        dec_params = tr.student_decoder_params(dstate, dec_params, use_ema=True)
        decoder.sample_timesteps = tuple(
            steps if i == unet_no - 1 else s
            for i, s in enumerate(decoder.sample_timesteps)
        )
        log.info("distilled student in slot %d: %s (DDIM-%d, CFG folded in)",
                 unet_no, dist["ckpt"], steps)

    wrapper = DALLE2Video(prior, decoder)
    default_st = decoder.sample_timesteps

    # data-parallel serving: shard each dispatched group over the device
    # mesh (one GSPMD program; params replicated, batch split on 'data').
    # Per-row keys keep samples identical to single-device serving.
    dp_mesh = None
    if bool(cfg.get("serve_data_parallel", False)) and len(jax.devices()) > 1:
        from dalle2_video_tpu.parallel.mesh import create_mesh

        dp_mesh = create_mesh(data=len(jax.devices()), model=1)
        log.info("data-parallel serving over %d devices", len(jax.devices()))

    # one COMPILED program per (cond_scale, ddim_steps) x token shape: the
    # jitted sampler is cached, so steady-state requests reuse compiled
    # programs — no per-request retracing, no op-by-op dispatch over the
    # axon tunnel. decoder.sample_timesteps (host-side static config) is
    # held at the override around EVERY call so that whenever jit traces
    # (first call per shape), the right DDIM grid is baked into the trace;
    # the engine lock serializes groups, so the mutation is race-free.
    compiled = {}

    def generate_batch(prompts, seeds, *, cond_scale, ddim_steps,
                       inpaint_video=None, inpaint_mask=None,
                       inpaint_method="replace",
                       inpaint_guidance_weight=10.0,
                       negative_prompts=None,
                       n_frames=None, overlap=None):
        from dalle2_video_tpu.utils import keys as keyutil

        tokens = jnp.asarray(tokenize(list(prompts)))
        # PER-ROW keys (utils/keys.py): every random draw in the prior and
        # decoder sampling scans is vmapped per row, so a request's video
        # is a pure function of its own seed — reproducible no matter
        # which micro-batch group it rode in or how the group was padded
        batch_key = keyutil.batch_keys(np.asarray(seeds, dtype=np.uint32))

        # inpainting tensors are traced args; everything that would force a
        # retrace (their shapes, the method branch, the guidance weight) is
        # part of the compiled-program signature
        inp = None
        if inpaint_video is not None:
            inp = (tuple(inpaint_video.shape), tuple(inpaint_mask.shape),
                   str(inpaint_method), float(inpaint_guidance_weight))
        has_neg = negative_prompts is not None
        sig = (float(cond_scale), ddim_steps, inp, has_neg, n_frames, overlap)
        fn = compiled.get(sig)
        if fn is None:
            _scale = float(cond_scale)
            _method = str(inpaint_method)
            _w = float(inpaint_guidance_weight)
            _n_frames, _overlap = n_frames, overlap

            # one traced callable per signature: optional args appear in
            # the SAME order the dispatch passes them (inpaint pair, then
            # negative-prompt tokens). split=True compiles the text tower,
            # the prior, and each decoder stage as SEPARATE cached programs
            # (jit_parts) — the axon compile service rejects the single
            # fused cascade graph with HTTP 413 (upload size cap)
            def run(tokens_, key_, *opt, split=False):
                opt = list(opt)
                kw = {}
                embed = compiled["text_embed_jit"] if split else (
                    lambda t: text_enc.apply(text_params, t)
                )
                if inp is not None:
                    kw["inpaint_video"] = opt.pop(0)
                    kw["inpaint_mask"] = opt.pop(0)
                    kw["inpaint_method"] = _method
                    kw["inpaint_guidance_weight"] = _w
                if has_neg:
                    kw["negative_text_embed"] = embed(opt.pop(0))
                if _n_frames is not None:
                    # long video (engine/longvideo.py): the sliding-window
                    # host loop reuses the same per-window compiled
                    # programs across ALL n_frames values
                    return wrapper.generate_long(
                        prior_params, dec_params, key_, embed(tokens_),
                        n_frames=int(_n_frames),
                        overlap=(int(_overlap) if _overlap else None),
                        cond_scale=_scale, jit_parts=split, **kw,
                    )
                return wrapper.generate(
                    prior_params, dec_params, key_, embed(tokens_),
                    cond_scale=_scale, jit_parts=split, **kw,
                )

            if dp_mesh is not None:
                from dalle2_video_tpu.parallel.sharded import (
                    make_data_parallel_sampler,
                )

                fn = make_data_parallel_sampler(run, dp_mesh)
            else:
                if "text_embed_jit" not in compiled:
                    compiled["text_embed_jit"] = jax.jit(
                        lambda t: text_enc.apply(text_params, t)
                    )
                fn = functools.partial(run, split=True)
            compiled[sig] = fn

        args = (tokens, batch_key)
        if inp is not None:
            args += (jnp.asarray(inpaint_video, jnp.float32),
                     jnp.asarray(inpaint_mask, jnp.float32))
        if has_neg:
            args += (jnp.asarray(tokenize(list(negative_prompts))),)
        decoder.sample_timesteps = (
            tuple(ddim_steps for _ in default_st)
            if ddim_steps is not None else default_st
        )
        try:
            return np.asarray(fn(*args))
        finally:
            decoder.sample_timesteps = default_st

    return generate_batch


def main() -> None:
    from dalle2_video_tpu.serve import GenerationEngine, serve_forever
    from dalle2_video_tpu.utils import config_from_argv
    from dalle2_video_tpu.utils.config import setup_platform

    cfg = config_from_argv("configs/celebv_text.yaml")
    logging.basicConfig(level=cfg.get("log_level", "INFO"))
    setup_platform(cfg)
    log = logging.getLogger("serve")

    if bool(cfg.get("smoke", False)):
        # tiny stack for an end-to-end serving smoke (same shapes as
        # train_decoder.py smoke mode), random weights, few DDIM steps
        cfg["frame_sizes"] = [16, 32]
        cfg["frame_numbers"] = [2, 2]
        cfg["unet1"] = {"dim": 16, "dim_mults": [1, 2], "num_resnet_blocks": 1,
                        "attn_heads": 2, "attn_dim_head": 8}
        cfg["unet2"] = {"dim": 8, "dim_mults": [1, 2], "num_resnet_blocks": 1,
                        "attn_heads": 2, "attn_dim_head": 8}
        cfg["prior"] = dict(cfg["prior"], depth=1, heads=2,
                            sample_timesteps=2)
        cfg.setdefault("serve_ddim_steps", 4)
        cfg.setdefault("serve_buckets", (1, 2))

    generate_batch = build_generate_batch(cfg, log)
    buckets = tuple(cfg.get("serve_buckets", (1, 2, 4)))
    if bool(cfg.get("serve_data_parallel", False)) and len(jax.devices()) > 1:
        # sharded groups must divide the data axis: round buckets up to
        # multiples of the device count (padding fills the extra rows)
        n = len(jax.devices())
        buckets = tuple(sorted({-(-b // n) * n for b in buckets}))
        log.info("data-parallel buckets rounded to %s (x%d devices)",
                 buckets, n)
    engine = GenerationEngine(
        generate_batch,
        buckets=buckets,
        max_wait_ms=float(cfg.get("serve_max_wait_ms", 25.0)),
        default_cond_scale=float(cfg.get("cond_scale", 1.0)),
        default_ddim_steps=(
            int(cfg["serve_ddim_steps"]) if cfg.get("serve_ddim_steps") else None
        ),
    )
    if cfg.get("warmup", True):
        log.info("warmup: compiling %s buckets ...", cfg.get("serve_buckets", (1, 2, 4)))
        log.info("warmup timings: %s", engine.warmup())

    device = jax.devices()[0].device_kind
    host, port = cfg.get("serve_host", "127.0.0.1"), int(cfg.get("serve_port", 8000))
    log.info("serving on http://%s:%d (device %s)", host, port, device)
    serve_forever(engine, host, port, device_name=device)


if __name__ == "__main__":
    main()
