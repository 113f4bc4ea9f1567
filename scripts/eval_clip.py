"""Dump full-dataset text + video embeddings — the handoff artifact to the
prior/decoder stages (rebuild of reference ``eval_clip.py``:63-79).

    python scripts/eval_clip.py [configs/celebv_text.yaml] [key=value ...]
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
    from dalle2_video_tpu.data import BatchLoader, CelebVTextDataset
    from dalle2_video_tpu.models.vivit import ViViTConfig
    from dalle2_video_tpu.train.clip_trainer import ClipTrainer
    from dalle2_video_tpu.utils import config_from_argv

    cfg = config_from_argv("configs/celebv_text.yaml")
    logging.basicConfig(level=cfg.get("log_level", "INFO"))
    from dalle2_video_tpu.utils.config import setup_platform

    setup_platform(cfg)
    log = logging.getLogger("eval_clip")

    ds = CelebVTextDataset(
        texts_path=cfg["texts"]["tokenized"],
        videos_path=cfg["videos"]["preprocessed"],
    )
    loader = BatchLoader(ds, cfg["clip"]["batch_size"], shuffle=False)

    ve = cfg["video_encoder"]
    vivit_cfg = ViViTConfig(
        frame_size=ve["frame_size"], patch_size=ve["patch_size"],
        num_frames=ve["num_frames"], dim=ve["dim"], depth=ve["depth"],
        heads=ve["heads"], dim_head=ve["dim_head"],
    )
    from dalle2_video_tpu.models.clip_text import CLIPTextConfig

    trainer = ClipTrainer(vivit_cfg, CLIPTextConfig(embed_dim=ve["dim"]))
    # SAME key derivation as train_clip (clip_stage_keys): the text tower
    # is a frozen RANDOM network when openai_ckpt is null, so eval must
    # rebuild the exact tower training targeted (round-4 bug: using the
    # unsplit root key here scored retrieval at exact chance).
    from dalle2_video_tpu.train.clip_trainer import clip_stage_keys

    k_vivit, k_text, _ = clip_stage_keys(cfg["seed"])

    sample = next(iter(BatchLoader(ds, 1, shuffle=False)))
    state = trainer.init_state(k_vivit, jnp.asarray(sample["videos"]))
    from dalle2_video_tpu.train.checkpoint import has_checkpoint, load_best, load_latest
    ckpt = Path(cfg["run_dir"]) / f"clip_{cfg['train_name']}"
    if has_checkpoint(str(ckpt)):
        # reference parity: eval_clip loads video_encoder_LAST.pt
        # (/root/reference/eval_clip.py:53-55), not best-on-val —
        # `eval_ckpt=best` opts into the best-val checkpoint instead
        which = str(cfg.get("eval_ckpt", "last"))
        state = (load_best if which == "best" else load_latest)(str(ckpt), state)
        log.info("loaded %s (%s)", ckpt, which)
    else:
        log.warning("no checkpoint at %s — using random encoder", ckpt)
    if cfg.get("torch_vivit_ckpt"):
        # reference interop: evaluate a torch video_encoder_{last,best}.pt
        # directly (import proven equivalent in tests/test_torch_import.py)
        import dataclasses as _dc

        from dalle2_video_tpu.models.torch_import import load_vivit_torch_ckpt

        state = _dc.replace(
            state,
            vivit_params=load_vivit_torch_ckpt(
                str(cfg["torch_vivit_ckpt"]), vivit_cfg
            ),
        )
        log.info("imported torch ViViT checkpoint %s", cfg["torch_vivit_ckpt"])
    text_params = trainer.init_text_params(k_text, cfg["clip"].get("openai_ckpt"))

    embed_v = jax.jit(trainer.embed_video)
    embed_t = jax.jit(lambda tp, toks: trainer.embed_text(tp, toks))

    v_out, t_out = [], []
    for batch in loader:
        v_out.append(np.asarray(embed_v(state, jnp.asarray(batch["videos"]))))
        t_out.append(np.asarray(embed_t(text_params, jnp.asarray(batch["texts"]))))

    # tail pass: BatchLoader is drop-remainder; the last n % batch_size
    # clips must still be embedded (this dump IS the dataset for the prior
    # and decoder stages — silently omitting rows excludes those clips
    # from all downstream training)
    done = sum(v.shape[0] for v in v_out)
    if done < len(ds):
        tail = ds.batch_items(np.arange(done, len(ds)))
        v_out.append(np.asarray(embed_v(state, jnp.asarray(tail["videos"]))))
        t_out.append(np.asarray(embed_t(text_params, jnp.asarray(tail["texts"]))))
        log.info("embedded %d tail clips (drop-remainder loader)",
                 len(ds) - done)

    video_embeds = np.concatenate(v_out)
    text_embeds = np.concatenate(t_out)
    Path(cfg["videos"]["embed"]).parent.mkdir(parents=True, exist_ok=True)
    Path(cfg["texts"]["embed"]).parent.mkdir(parents=True, exist_ok=True)
    np.save(cfg["videos"]["embed"], video_embeds)
    np.save(cfg["texts"]["embed"], text_embeds)
    log.info(
        "wrote %s %s and %s %s",
        cfg["videos"]["embed"], video_embeds.shape,
        cfg["texts"]["embed"], text_embeds.shape,
    )

    # full-dataset retrieval accuracy (reference Classifier's sequential
    # OOM-safe path, utils.py:57-129): video->text top-k over ALL pairs,
    # similarity rows computed in chunks
    v = video_embeds / np.linalg.norm(video_embeds, axis=-1, keepdims=True)
    t = text_embeds / np.linalg.norm(text_embeds, axis=-1, keepdims=True)
    n = len(v)
    hits = {1: 0, 10: 0}
    chunk = 1024
    for s in range(0, n, chunk):
        sim = v[s : s + chunk] @ t.T  # (c, N)
        own = sim[np.arange(sim.shape[0]), np.arange(s, min(s + chunk, n))]
        rank = (sim >= own[:, None]).sum(axis=1)
        for k in hits:
            hits[k] += int((rank <= k).sum())
    log.info(
        "retrieval over %d pairs: top1=%.4f top10=%.4f",
        n, hits[1] / n, hits[10] / n,
    )


if __name__ == "__main__":
    main()
