"""Torch-checkpoint import: LIVE oracle equivalence vs the reference.

``/root/reference/dalle2_video/video_encoder.py`` imports only torch +
einops (no dalle2_pytorch), so it can be loaded read-only as a numeric
oracle: random-init the reference ViViT, export its ``state_dict()``
(exactly what ``train_clip.py:195-199`` saves), import through
``vivit_params_from_torch``, and require output equality. This proves a
user's trained ``video_encoder_{last,best}.pt`` produces bit-comparable
embeddings after switching frameworks.

Skips when the reference tree is absent (the importer itself is covered
by the synthetic-state-dict test below either way).
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

from dalle2_video_tpu.models.torch_import import (
    load_vivit_torch_ckpt,
    vivit_params_from_torch,
)
from dalle2_video_tpu.models.vivit import ViViT, ViViTConfig

torch = pytest.importorskip("torch")

REF_VIVIT = "/root/reference/dalle2_video/video_encoder.py"

CFG = ViViTConfig(
    frame_size=8, patch_size=4, num_frames=25, dim=16, depth=2, heads=2,
    dim_head=8, scale_dim_attn=2, scale_dim_conv=5,
)
# heads=1, dim_head=dim -> reference Attention.project_out=False (to_out
# is Identity and absent from the state dict)
CFG_NO_PROJ = ViViTConfig(
    frame_size=8, patch_size=4, num_frames=25, dim=16, depth=1, heads=1,
    dim_head=16, scale_dim_attn=2, scale_dim_conv=5,
)


def _load_reference_vivit():
    spec = importlib.util.spec_from_file_location("ref_video_encoder", REF_VIVIT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_state_dict(cfg: ViViTConfig, seed: int = 0):
    mod = _load_reference_vivit()
    torch.manual_seed(seed)
    model = mod.ViViT(
        frame_size=cfg.frame_size, patch_size=cfg.patch_size,
        num_frames=cfg.num_frames, dim=cfg.dim, depth=cfg.depth,
        heads=cfg.heads, in_channels=cfg.in_channels, dim_head=cfg.dim_head,
        dropout=0.0, emb_dropout=0.0, scale_dim_attn=cfg.scale_dim_attn,
        scale_dim_conv=cfg.scale_dim_conv,
    ).eval()
    return model, model.state_dict()


@pytest.mark.skipif(not os.path.exists(REF_VIVIT), reason="reference absent")
@pytest.mark.parametrize("cfg", [CFG, CFG_NO_PROJ], ids=["mha", "no_proj"])
def test_vivit_import_matches_reference_oracle(cfg):
    model, sd = _ref_state_dict(cfg)
    params = vivit_params_from_torch(sd, cfg)

    rng = np.random.default_rng(1)
    video = rng.standard_normal(
        (2, cfg.num_frames, cfg.frame_size, cfg.frame_size, 3), dtype=np.float32
    )
    ours = np.asarray(ViViT(cfg).apply(params, video))

    with torch.no_grad():
        # reference layout (b, t, c, h, w) — video_encoder.py:120-123
        theirs = model(
            torch.from_numpy(np.transpose(video, (0, 1, 4, 2, 3)))
        ).numpy()

    assert ours.shape == theirs.shape == (2, cfg.dim)
    # f32 matmul accumulation-order noise between XLA-CPU and torch is
    # ~1e-4 relative through 2 transformer towers; a wrong key map or
    # fold permutation produces O(1) errors, so this is conclusive
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not os.path.exists(REF_VIVIT), reason="reference absent")
def test_vivit_ckpt_file_roundtrip(tmp_path):
    """The on-disk path: torch.save(state_dict) (train_clip.py:195) ->
    load_vivit_torch_ckpt -> identical params to the in-memory import."""
    _, sd = _ref_state_dict(CFG, seed=3)
    p = tmp_path / "video_encoder_best.pt"
    torch.save(sd, p)
    from_file = load_vivit_torch_ckpt(str(p), CFG)
    in_mem = vivit_params_from_torch(sd, CFG)
    import jax

    jax.tree.map(np.testing.assert_array_equal, from_file, in_mem)


def test_vivit_import_rejects_wrong_geometry():
    sd = {"pos_embedding": np.zeros((1, 25, 5, 8), np.float32)}
    with pytest.raises(ValueError, match="geometry"):
        vivit_params_from_torch(sd, CFG)


def test_vivit_import_synthetic_no_reference():
    """Reference-free structural check (runs even without /root/reference):
    a synthetic state dict with the documented key schema imports into a
    tree the flax module accepts."""
    cfg = CFG
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.standard_normal(shape).astype(np.float32)

    d, inner = cfg.dim, cfg.heads * cfg.dim_head
    sd = {
        "to_patch_embedding.1.weight": t(d, 3 * cfg.patch_size**2),
        "to_patch_embedding.1.bias": t(d),
        "pos_embedding": t(1, cfg.num_frames,
                           (cfg.frame_size // cfg.patch_size) ** 2 + 1, d),
        "temporal_conv.2.weight": t(d, d * cfg.scale_dim_conv, 3),
        "temporal_conv.2.bias": t(d),
        "temporal_conv.4.weight": t(d, d * cfg.scale_dim_conv, 3),
        "temporal_conv.4.bias": t(d),
        "to_out.1.weight": t(d * cfg.num_frames // cfg.scale_dim_conv**2),
        "to_out.1.bias": t(d * cfg.num_frames // cfg.scale_dim_conv**2),
        "to_out.2.weight": t(d, d * cfg.num_frames // cfg.scale_dim_conv**2),
        "to_out.2.bias": t(d),
    }
    for tower in ("space_transformer", "temporal_transformer"):
        for i in range(cfg.depth):
            pre = f"{tower}.layers.{i}"
            sd |= {
                f"{pre}.0.norm.weight": t(d), f"{pre}.0.norm.bias": t(d),
                f"{pre}.0.fn.to_qkv.weight": t(3 * inner, d),
                f"{pre}.0.fn.to_out.0.weight": t(d, inner),
                f"{pre}.0.fn.to_out.0.bias": t(d),
                f"{pre}.1.norm.weight": t(d), f"{pre}.1.norm.bias": t(d),
                f"{pre}.1.fn.net.0.weight": t(d * cfg.scale_dim_attn, d),
                f"{pre}.1.fn.net.0.bias": t(d * cfg.scale_dim_attn),
                f"{pre}.1.fn.net.3.weight": t(d, d * cfg.scale_dim_attn),
                f"{pre}.1.fn.net.3.bias": t(d),
            }
    params = vivit_params_from_torch(sd, cfg)
    out = ViViT(cfg).apply(
        params, np.zeros((1, cfg.num_frames, 8, 8, 3), np.float32)
    )
    assert out.shape == (1, cfg.dim)
