"""End-to-end text -> video sampling (DALLE2Video.forward equivalent).

Given trained prior + decoder checkpoints, tokenizes prompts, embeds text
(frozen tower), samples a video embedding through the prior (best-of-N
reranked), and runs the decoder cascade. Usage:

    python scripts/sample.py configs/celebv_text.yaml \
        prompt="a person smiling" cond_scale=3.0 out=samples.npy

Conditional generation (engine/decoder.py inpainting — the reference
samples from noise only):

    # extend a clip: frames 0,1 of known.npy are kept exactly
    python scripts/sample.py ... inpaint_video=known.npy inpaint_frames=0,1
    # arbitrary region: mask.npy broadcastable to (T, H, W, 1), 1 = known
    python scripts/sample.py ... inpaint_video=known.npy inpaint_mask=mask.npy
    # reconstruction guidance on top of replacement (VDM eq. 7)
    ... inpaint_method=guided inpaint_guidance_weight=10

Negative prompting (CFG away from a concept; needs cond_scale > 1):

    python scripts/sample.py ... cond_scale=3.0 \
        negative_prompt="a blurry face"

Long video (beyond-reference; the reference samples only the training
frame count): autoregressive sliding-window decoding, engine/longvideo.py.

    python scripts/sample.py ... n_frames=64 overlap=4
"""

from __future__ import annotations

import logging
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    from dalle2_video_tpu.data.tokenizer import tokenize
    from dalle2_video_tpu.engine.dalle2video import DALLE2Video
    from dalle2_video_tpu.models.clip_text import CLIPTextEncoder
    from dalle2_video_tpu.models.prior import prior_from_config
    from dalle2_video_tpu.utils import config_from_argv
    from scripts.train_decoder import build_decoder, build_trainer

    cfg = config_from_argv("configs/celebv_text.yaml")
    logging.basicConfig(level=cfg.get("log_level", "INFO"))
    from dalle2_video_tpu.utils.config import setup_platform

    setup_platform(cfg)
    log = logging.getLogger("sample")

    prompt = cfg.get("prompt", "a person talking")
    cond_scale = float(cfg.get("cond_scale", 1.0))
    out_path = cfg.get("out", "samples.npy")
    rng = jax.random.PRNGKey(int(cfg.get("sample_seed", 0)))

    # text embedding (frozen tower; output dim must match the CLIP dim)
    from dalle2_video_tpu.models.clip_text import CLIPTextConfig

    tokens = jnp.asarray(tokenize([prompt]))
    text_enc = CLIPTextEncoder(CLIPTextConfig(embed_dim=cfg["dim"]))
    # independent keys: prior init vs the generation noise stream
    k_text, k_init, k_gen = jax.random.split(rng, 3)
    openai = cfg["clip"].get("openai_ckpt")
    if openai:
        from dalle2_video_tpu.models.clip_text import load_openai_clip_text_params

        text_params = load_openai_clip_text_params(openai)
    else:
        log.warning("no OpenAI ckpt — random text tower (smoke mode)")
        text_params = text_enc.init(k_text, tokens)
    text_embed = text_enc.apply(text_params, tokens)

    # ONE factory shared with train_prior/serve so layout-affecting knobs
    # (scan_layers, ff_experts) always match the checkpoint
    prior = prior_from_config(cfg)
    prior_params = prior.init_params(k_init)
    from dalle2_video_tpu.train.checkpoint import (
        has_checkpoint, load_best, load_params_subtree,
    )
    prior_ckpt = Path(cfg["run_dir"]) / f"prior_{cfg['train_name']}"
    if has_checkpoint(str(prior_ckpt)):
        # layout-agnostic: train_prior saves FULL training state (resume
        # support); inference wants just the params subtree
        prior_params = load_params_subtree(str(prior_ckpt), prior_params)
        log.info("loaded prior %s", prior_ckpt)

    decoder = build_decoder(cfg)
    trainer = build_trainer(cfg, decoder)
    state = trainer.init_state(jax.random.PRNGKey(0))
    dec_ckpt = Path(cfg["run_dir"]) / f"decoder_{cfg['train_name']}"
    if has_checkpoint(str(dec_ckpt)):
        # best-by-val state from either layout (RollingCheckpointManager
        # recent/+best/ directories or the legacy last/best pair)
        state = load_best(str(dec_ckpt), state)
        log.info("loaded decoder %s", dec_ckpt)
    dec_params = trainer.sampling_params(state)

    inpaint_kwargs = {}
    if cfg.get("inpaint_video"):
        known = np.asarray(np.load(cfg["inpaint_video"]), np.float32)
        if known.ndim == 4:  # (T, H, W, C) -> batch of 1
            known = known[None]
        if cfg.get("inpaint_mask"):
            mask = np.asarray(np.load(cfg["inpaint_mask"]), np.float32)
            if mask.ndim == 4:
                mask = mask[None]
        else:
            frames = cfg.get("inpaint_frames")
            assert frames is not None, (
                "inpaint_video needs inpaint_mask=<npy> or inpaint_frames=0,1"
            )
            if not isinstance(frames, (list, tuple)):
                frames = [int(x) for x in str(frames).split(",")]
            mask = np.zeros((1, known.shape[1], 1, 1, 1), np.float32)
            mask[:, list(map(int, frames))] = 1.0
        inpaint_kwargs = dict(
            inpaint_video=jnp.asarray(known),
            inpaint_mask=jnp.asarray(mask),
            inpaint_method=str(cfg.get("inpaint_method", "replace")),
            inpaint_guidance_weight=float(
                cfg.get("inpaint_guidance_weight", 10.0)
            ),
        )
        log.info("inpainting: known %s, mask %s, method=%s",
                 known.shape, mask.shape, inpaint_kwargs["inpaint_method"])

    if cfg.get("negative_prompt"):
        neg_tokens = jnp.asarray(tokenize([str(cfg["negative_prompt"])]))
        inpaint_kwargs["negative_text_embed"] = text_enc.apply(
            text_params, neg_tokens
        )
        log.info("negative prompt: %r", cfg["negative_prompt"])

    wrapper = DALLE2Video(prior, decoder)
    # jit_parts: compiled prior + per-stage decoder programs (the fused
    # whole-cascade program can exceed the axon compile upload cap)
    n_frames = cfg.get("n_frames")
    if n_frames is not None and int(n_frames) > decoder.config.frame_numbers[-1]:
        if "inpaint_video" in inpaint_kwargs:
            raise SystemExit("n_frames= (long video) and inpaint_video= are "
                             "mutually exclusive — the long-video path drives "
                             "the inpainting machinery itself")
        video = wrapper.generate_long(
            prior_params, dec_params, k_gen, text_embed,
            n_frames=int(n_frames),
            overlap=(int(cfg["overlap"]) if cfg.get("overlap") else None),
            cond_scale=cond_scale, jit_parts=True,
            **{k: v for k, v in inpaint_kwargs.items()
               if k == "negative_text_embed"},
        )
    else:
        video = wrapper.generate(
            prior_params, dec_params, k_gen, text_embed, cond_scale=cond_scale,
            jit_parts=True, **inpaint_kwargs,
        )
    np.save(out_path, np.asarray(video))
    log.info("wrote %s %s", out_path, video.shape)


if __name__ == "__main__":
    main()
