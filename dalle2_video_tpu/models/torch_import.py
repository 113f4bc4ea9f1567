"""Import reference torch checkpoints into this framework's param pytrees.

The reference saves raw ``state_dict()`` blobs (``train_clip.py:195-199``
``video_encoder_{last,best}.pt``; ``train_decoder.py:177-182``
``decoder_{last,best}.pt``). A user switching from SeanNobel/DALLE2-video
brings those files; this module converts them to flax param trees so the
trained towers drop straight into eval/serving/fine-tuning here.

Covered (with a LIVE torch-oracle equivalence test where the reference
module is importable without the absent ``dalle2_pytorch`` dep):

  * ``vivit_params_from_torch``   — stage-1 video tower
    (reference ``dalle2_video/video_encoder.py``, first-party, torch-only
    imports -> tests/test_torch_import.py loads it as an oracle and proves
    output equality after import).

Layout conversions (torch -> flax):
  * Linear  weight (out, in)        -> kernel (in, out)            [T]
  * Conv1d  weight (out, in, k)     -> kernel (k, in, out)         [perm]
  * LayerNorm weight/bias           -> scale/bias                  [copy]

Beyond the per-tensor transposes, THREE channel-order permutations are
needed because this rebuild folds axes channels-last where the reference
folds channels-first (intended-behavior divergence, SURVEY §2e style —
the function computed is identical up to these fixed permutations):

  1. temporal-conv inputs: reference ``Rearrange("b d (t s) -> b (d s) t")``
     makes channel index ``d_idx * s + s_idx`` (d-major); this rebuild's
     ``(b, t//s, s, d)`` reshape makes ``s_idx * d + d_idx`` (s-major)
     (``models/vivit.py:169,173`` vs ``video_encoder.py:137-144``).
  2. same permutation again for the second conv.
  3. the flatten before the output head: reference ``nn.Flatten`` on
     (b, d, t) is d-major; this rebuild's ``reshape(b, -1)`` on (b, t, d)
     is t-major (``models/vivit.py:179`` vs ``video_encoder.py:146-151``)
     -> permute the LayerNorm scale/bias and the final Linear rows.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from dalle2_video_tpu.models.vivit import ViViTConfig

__all__ = ["vivit_params_from_torch", "load_vivit_torch_ckpt"]


def _np(t) -> np.ndarray:
    """torch tensor (or array) -> float32 numpy without importing torch."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _linear(sd: Mapping[str, Any], key: str, *, bias: bool = True) -> Dict:
    out = {"kernel": _np(sd[f"{key}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{key}.bias"])
    return out


def _layernorm(sd: Mapping[str, Any], key: str) -> Dict:
    return {"scale": _np(sd[f"{key}.weight"]), "bias": _np(sd[f"{key}.bias"])}


def _transformer(sd: Mapping[str, Any], prefix: str, depth: int) -> Dict:
    """Reference ``Transformer`` (video_encoder.py:73-95): per layer,
    ``layers.{i}.0`` = PreNorm(Attention), ``layers.{i}.1`` = PreNorm(FF);
    attention out-proj is ``to_out.0`` (Sequential(Linear, Dropout)), FF
    linears are ``net.0`` / ``net.3``."""
    params: Dict[str, Any] = {}
    for i in range(depth):
        attn = f"{prefix}.layers.{i}.0"
        ff = f"{prefix}.layers.{i}.1"
        params[f"attn_norm{i}"] = _layernorm(sd, f"{attn}.norm")
        a: Dict[str, Any] = {
            "to_qkv": _linear(sd, f"{attn}.fn.to_qkv", bias=False)
        }
        if f"{attn}.fn.to_out.0.weight" in sd:  # project_out (Identity otherwise)
            a["to_out"] = _linear(sd, f"{attn}.fn.to_out.0")
        params[f"attn{i}"] = a
        params[f"ff_norm{i}"] = _layernorm(sd, f"{ff}.norm")
        params[f"ff{i}"] = {
            "Dense_0": _linear(sd, f"{ff}.fn.net.0"),
            "Dense_1": _linear(sd, f"{ff}.fn.net.3"),
        }
    return params


def _fold_perm(dim: int, s: int) -> np.ndarray:
    """perm[ours] = theirs: ours channel = s_idx * dim + d_idx (s-major),
    reference channel = d_idx * s + s_idx (d-major)."""
    s_idx, d_idx = np.meshgrid(np.arange(s), np.arange(dim), indexing="ij")
    return (d_idx * s + s_idx).reshape(-1)  # index by ours-order


def _temporal_conv(sd: Mapping[str, Any], key: str, dim: int, s: int) -> Dict:
    """Conv1d (dim, dim*s, 3) -> flax (3, dim*s, dim) with the d-major ->
    s-major input-channel permutation (module docstring, item 1/2)."""
    w = _np(sd[f"{key}.weight"])  # (out, in, k)
    kernel = np.transpose(w, (2, 1, 0))[:, _fold_perm(dim, s), :]
    return {"kernel": kernel, "bias": _np(sd[f"{key}.bias"])}


def vivit_params_from_torch(
    state_dict: Mapping[str, Any], cfg: ViViTConfig
) -> Dict[str, Any]:
    """Reference ViViT ``state_dict()`` -> ``{"params": ...}`` for
    ``models/vivit.py::ViViT`` (shape-checked; raises KeyError on missing
    keys, ValueError on geometry mismatch)."""
    sd = state_dict
    d, s = cfg.dim, cfg.scale_dim_conv
    pos = _np(sd["pos_embedding"])
    want = (1, cfg.num_frames, (cfg.frame_size // cfg.patch_size) ** 2 + 1, d)
    if pos.shape != want:
        raise ValueError(
            f"pos_embedding {pos.shape} != {want} — checkpoint geometry "
            "does not match ViViTConfig"
        )

    params: Dict[str, Any] = {
        "patch_embed": _linear(sd, "to_patch_embedding.1"),
        "pos_embedding": pos,
        "space_transformer": _transformer(sd, "space_transformer", cfg.depth),
        "temporal_transformer": _transformer(
            sd, "temporal_transformer", cfg.depth
        ),
        "temporal_conv1": _temporal_conv(sd, "temporal_conv.2", d, s),
        "temporal_conv2": _temporal_conv(sd, "temporal_conv.4", d, s),
    }

    # output head: reference flattens (b, d, t) d-major; ours (b, t, d)
    # t-major (docstring item 3). to_out_dim = dim * num_frames / s**2.
    t_out = cfg.num_frames // (s * s)
    d_idx, t_idx = np.meshgrid(np.arange(d), np.arange(t_out), indexing="ij")
    perm = (d_idx * t_out + t_idx).T.reshape(-1)  # ours (t-major) <- theirs
    norm = _layernorm(sd, "to_out.1")
    head = _linear(sd, "to_out.2")
    params["out_norm"] = {"scale": norm["scale"][perm], "bias": norm["bias"][perm]}
    params["to_out"] = {"kernel": head["kernel"][perm], "bias": head["bias"]}
    return {"params": params}


def load_vivit_torch_ckpt(path: str, cfg: ViViTConfig) -> Dict[str, Any]:
    """Load a reference ``video_encoder_{last,best}.pt`` (raw state_dict,
    ``train_clip.py:195-199``) from disk. torch is an import-time dep of
    this function only (present in-env for checkpoint interop)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return vivit_params_from_torch(sd, cfg)
