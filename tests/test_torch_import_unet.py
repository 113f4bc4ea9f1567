"""Unet3D / decoder / trainer-bundle torch-checkpoint import (VERDICT r3 #6).

The reference's Unet3D cannot be instantiated here (its ``dalle2_pytorch``
dep is absent), so — exactly like the CLIP-text import test — these tests
synthesize a torch ORACLE: a minimal torch mirror whose module tree
reproduces the reference's ``state_dict()`` naming and forward semantics
(structure per /root/reference/dalle2_video/dalle2_video.py:19-952 and the
inherited dalle2-pytorch Attention/CrossAttention/LayerNorm). The mirror's
random weights are imported through ``unet3d_params_from_torch`` and the
two forwards must agree numerically; strict mode proves every torch key
was consumed.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F

from dalle2_video_tpu.models import UNet3DConfig
from dalle2_video_tpu.models.torch_import import (
    decoder_params_from_torch,
    trainer_state_from_torch,
    unet3d_params_from_torch,
)
from dalle2_video_tpu.models.unet3d import UNet3D

# ---------------------------------------------------------------------- #
# torch mirror of the reference module tree
# ---------------------------------------------------------------------- #


class LayerNormG(nn.Module):
    """lucidrains scale-only LayerNorm (param ``g``)."""

    def __init__(self, dim):
        super().__init__()
        self.g = nn.Parameter(torch.ones(dim))

    def forward(self, x):
        return F.layer_norm(x, x.shape[-1:], eps=1e-5) * self.g


class SinusoidalPosEmb(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dim = dim

    def forward(self, t):
        half = self.dim // 2
        freqs = torch.exp(
            torch.arange(half, dtype=torch.float32)
            * -(math.log(10000.0) / (half - 1))
        )
        args = t.float()[:, None] * freqs[None, :]
        return torch.cat([args.sin(), args.cos()], dim=-1)


class RefAttention(nn.Module):
    """dalle2-pytorch Attention: MQA (single kv head) + learned null kv."""

    def __init__(self, dim, heads=8, dim_head=64):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.norm = LayerNormG(dim)
        self.null_kv = nn.Parameter(torch.randn(2, dim_head))
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(dim, dim_head * 2, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim, bias=False), LayerNormG(dim))

    def forward(self, x):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        xn = self.norm(x)
        q = self.to_q(xn).reshape(b, n, h, d)
        k, v = self.to_kv(xn).chunk(2, dim=-1)
        nk = self.null_kv[0].expand(b, 1, d)
        nv = self.null_kv[1].expand(b, 1, d)
        k = torch.cat([nk, k], dim=1)
        v = torch.cat([nv, v], dim=1)
        sim = torch.einsum("bnhd,bmd->bhnm", q * d**-0.5, k)
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhnm,bmd->bnhd", attn, v).reshape(b, n, h * d)
        return self.to_out(out)


class RefCrossAttention(nn.Module):
    """dalle2-pytorch CrossAttention (norm_context=False path)."""

    def __init__(self, dim, context_dim, heads=8, dim_head=64):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.norm = LayerNormG(dim)
        self.null_kv = nn.Parameter(torch.randn(2, dim_head))
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_kv = nn.Linear(context_dim, inner * 2, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim, bias=False), LayerNormG(dim))

    def forward(self, x, context):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        xn = self.norm(x)
        q = self.to_q(xn).reshape(b, n, h, d)
        k, v = self.to_kv(context).chunk(2, dim=-1)
        k = k.reshape(b, -1, h, d)
        v = v.reshape(b, -1, h, d)
        nk = self.null_kv[0].expand(b, 1, h, d)
        nv = self.null_kv[1].expand(b, 1, h, d)
        k = torch.cat([nk, k], dim=1)
        v = torch.cat([nv, v], dim=1)
        sim = torch.einsum("bnhd,bmhd->bmhn", q * d**-0.5, k)
        attn = sim.softmax(dim=1)
        out = torch.einsum("bmhn,bmhd->bnhd", attn, v).reshape(b, n, h * d)
        return self.to_out(out)


class Residual(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x, *a, **kw):
        return self.fn(x, *a, **kw) + x


class RearrangeToSequence(nn.Module):
    """b c t h w -> (b, t*h*w, c) around fn (reference via dalle2-pytorch)."""

    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        b, c, t, h, w = x.shape
        tokens = x.permute(0, 2, 3, 4, 1).reshape(b, t * h * w, c)
        tokens = self.fn(tokens)
        return tokens.reshape(b, t, h, w, c).permute(0, 4, 1, 2, 3)


def conv3d_space(cin, cout, k, stride=1):
    return nn.Conv3d(cin, cout, (1, k, k), stride=(1, stride, stride),
                     padding=(0, (k - stride) // 2, (k - stride) // 2))


class RefBlock3D(nn.Module):
    """reference Block3D (dalle2_video.py:99-133)."""

    def __init__(self, dim, dim_out, groups):
        super().__init__()
        self.project = conv3d_space(dim, dim_out, 3)
        self.norm = nn.GroupNorm(groups, dim_out)

    def forward(self, x, scale_shift=None):
        x = self.norm(self.project(x))
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return F.silu(x)


class RefResnetBlock3D(nn.Module):
    """reference ResnetBlock3D (dalle2_video.py:136-205)."""

    def __init__(self, dim, dim_out, *, cond_dim=None, time_cond_dim=None, groups=8):
        super().__init__()
        self.time_mlp = (
            nn.Sequential(nn.SiLU(), nn.Linear(time_cond_dim, dim_out * 2))
            if time_cond_dim is not None else None
        )
        self.cross_attn = (
            RefCrossAttention(dim_out, cond_dim) if cond_dim is not None else None
        )
        self.block1 = RefBlock3D(dim, dim_out, groups)
        self.block2 = RefBlock3D(dim_out, dim_out, groups)
        self.res_conv = (
            nn.Conv3d(dim, dim_out, 1) if dim != dim_out else nn.Identity()
        )

    def forward(self, x, time_emb=None, cond=None):
        scale_shift = None
        if self.time_mlp is not None and time_emb is not None:
            te = self.time_mlp(time_emb)[:, :, None, None, None]
            scale_shift = te.chunk(2, dim=1)
        h = self.block1(x, scale_shift=scale_shift)
        if self.cross_attn is not None:
            b, c, t, hh, ww = h.shape
            tokens = h.permute(0, 2, 3, 4, 1).reshape(b, t * hh * ww, c)
            tokens = self.cross_attn(tokens, context=cond) + tokens
            h = tokens.reshape(b, t, hh, ww, c).permute(0, 4, 1, 2, 3)
        h = self.block2(h)
        return h + self.res_conv(x)


class RefCrossEmbed(nn.Module):
    """reference CrossEmbedLayer3D (dalle2_video.py:208-244)."""

    def __init__(self, dim_in, kernel_sizes, dim_out, stride=2):
        super().__init__()
        ks = sorted(kernel_sizes)
        dim_scales = [dim_out // (2 ** i) for i in range(1, len(ks))]
        dim_scales = [*dim_scales, dim_out - sum(dim_scales)]
        self.convs = nn.ModuleList(
            [conv3d_space(dim_in, d, k, stride=stride) for k, d in zip(ks, dim_scales)]
        )

    def forward(self, x):
        return torch.cat([c(x) for c in self.convs], dim=1)


class PixelUnshuffle3D(nn.Module):
    def forward(self, x):  # b c t (h s1) (w s2) -> b (c s1 s2) t h w
        b, c, t, h, w = x.shape
        x = x.reshape(b, c, t, h // 2, 2, w // 2, 2)
        x = x.permute(0, 1, 4, 6, 2, 3, 5)
        return x.reshape(b, c * 4, t, h // 2, w // 2)


def ref_downsample3d(dim, dim_out):
    """reference Downsample3D (dalle2_video.py:19-26): params at index 1."""
    return nn.Sequential(PixelUnshuffle3D(), nn.Conv3d(dim * 4, dim_out, 1))


def ref_nearest_upsample(dim, dim_out):
    """reference NearestUpsample3D (dalle2_video.py:29-35)."""
    return nn.Sequential(
        nn.Upsample(scale_factor=(1, 2, 2), mode="nearest"),
        conv3d_space(dim, dim_out, 3),
    )


class RefPixelShuffleUpsample3D(nn.Module):
    """reference PixelShuffleUpsample3D (dalle2_video.py:38-78)."""

    def __init__(self, dim, dim_out):
        super().__init__()
        self.conv = nn.Conv3d(dim, dim_out * 4, 1)
        self.pixel_shuffle = nn.PixelShuffle(2)

    def forward(self, x):
        x = F.silu(self.conv(x))
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.pixel_shuffle(x)
        c2, h2, w2 = x.shape[1:]
        return x.reshape(b, t, c2, h2, w2).permute(0, 2, 1, 3, 4)


class RefUnet3D(nn.Module):
    """torch mirror of reference Unet3D's module tree + forward
    (dalle2_video.py:247-952) for the configs these tests exercise
    (no lowres / text / self-cond / video-embed paths unless flagged)."""

    def __init__(self, cfg: UNet3DConfig):
        super().__init__()
        self.cfg = cfg
        dim = cfg.dim
        cond_dim = cfg.resolved_cond_dim
        tcd = cfg.time_cond_dim
        init_dim = cfg.resolved_init_dim
        init_channels = cfg.channels * (
            1 + int(cfg.lowres_cond) + int(cfg.self_cond)
        )

        if cfg.init_cross_embed:
            self.init_conv = RefCrossEmbed(
                init_channels, cfg.init_cross_embed_kernel_sizes, init_dim, stride=1
            )
        else:
            self.init_conv = conv3d_space(init_channels, init_dim, cfg.init_conv_ksize)

        self.to_time_hiddens = nn.Sequential(
            SinusoidalPosEmb(dim), nn.Linear(dim, tcd), nn.GELU()
        )
        self.to_time_tokens = nn.Sequential(
            nn.Linear(tcd, cond_dim * cfg.num_time_tokens)
        )
        self.to_time_cond = nn.Sequential(nn.Linear(tcd, tcd))

        # nulls registered unconditionally (reference :412-416)
        self.null_video_embed = nn.Parameter(
            torch.randn(1, cfg.num_video_tokens, cond_dim)
        )
        self.null_video_hiddens = nn.Parameter(torch.randn(1, tcd))
        self.null_text_embed = nn.Parameter(torch.randn(1, cfg.max_text_len, cond_dim))

        if cfg.cond_on_video_embeds and cfg.add_video_embeds_to_time:
            self.to_video_hiddens = nn.Sequential(
                nn.Linear(cfg.video_embed_dim, tcd), nn.GELU()
            )
        if (
            cfg.cond_on_video_embeds
            and cfg.video_embed_dim is not None
            and cfg.video_embed_dim != cond_dim
        ):
            self.video_to_tokens = nn.Sequential(
                nn.Linear(cfg.video_embed_dim, cond_dim * cfg.num_video_tokens)
            )

        self.norm_cond = nn.LayerNorm(cond_dim)
        self.norm_mid_cond = nn.LayerNorm(cond_dim)

        in_out = cfg.stage_dims
        num = len(in_out)
        groups = cfg.resnet_groups if isinstance(cfg.resnet_groups, int) else None
        assert groups is not None, "tests use a scalar resnet_groups"
        nblocks = cfg.num_resnet_blocks
        assert isinstance(nblocks, int)
        self_attn = (
            cfg.self_attn if isinstance(cfg.self_attn, tuple)
            else (cfg.self_attn,) * num
        )

        def downsample(din, dout):
            if cfg.cross_embed_downsample:
                return RefCrossEmbed(
                    din, cfg.cross_embed_downsample_kernel_sizes, dout, stride=2
                )
            return ref_downsample3d(din, dout)

        def upsample(din, dout):
            if cfg.pixel_shuffle_upsample:
                return RefPixelShuffleUpsample3D(din, dout)
            return ref_nearest_upsample(din, dout)

        attn_kwargs = dict(heads=cfg.attn_heads, dim_head=cfg.attn_dim_head)
        mk_attn = lambda d: RearrangeToSequence(Residual(RefAttention(d, **attn_kwargs)))

        self.init_resnet_block = (
            RefResnetBlock3D(init_dim, init_dim, time_cond_dim=tcd, groups=groups)
            if cfg.memory_efficient else None
        )

        self.downs = nn.ModuleList([])
        self.ups = nn.ModuleList([])
        for ind, (din, dout) in enumerate(in_out):
            is_first, is_last = ind == 0, ind >= num - 1
            layer_cond = cond_dim if not is_first else None
            dl = dout if cfg.memory_efficient else din
            self.downs.append(nn.ModuleList([
                downsample(din, dout) if cfg.memory_efficient else None,
                RefResnetBlock3D(dl, dl, time_cond_dim=tcd, groups=groups),
                nn.ModuleList([
                    RefResnetBlock3D(dl, dl, cond_dim=layer_cond,
                                     time_cond_dim=tcd, groups=groups)
                    for _ in range(nblocks)
                ]),
                mk_attn(dl) if self_attn[ind] else nn.Identity(),
                downsample(dl, dout)
                if not is_last and not cfg.memory_efficient
                else nn.Conv3d(dl, dout, 1),
            ]))

        mid = in_out[-1][1]
        self.mid_block1 = RefResnetBlock3D(
            mid, mid, cond_dim=cond_dim, time_cond_dim=tcd, groups=groups)
        self.mid_attn = mk_attn(mid) if cfg.attend_at_middle else None
        self.mid_block2 = RefResnetBlock3D(
            mid, mid, cond_dim=cond_dim, time_cond_dim=tcd, groups=groups)

        for ind, (din, dout) in enumerate(reversed(in_out)):
            is_last = ind >= num - 1
            layer_cond = cond_dim if not is_last else None
            sa = tuple(reversed(self_attn))[ind]
            skip = dout if cfg.memory_efficient else din
            self.ups.append(nn.ModuleList([
                RefResnetBlock3D(dout + skip, dout, cond_dim=layer_cond,
                                 time_cond_dim=tcd, groups=groups),
                nn.ModuleList([
                    RefResnetBlock3D(dout + skip, dout, cond_dim=layer_cond,
                                     time_cond_dim=tcd, groups=groups)
                    for _ in range(nblocks)
                ]),
                mk_attn(dout) if sa else nn.Identity(),
                upsample(dout, din)
                if not is_last or cfg.memory_efficient
                else nn.Identity(),
            ]))

        self.final_resnet_block = RefResnetBlock3D(
            cfg.dim + cfg.dim, cfg.dim, time_cond_dim=tcd, groups=groups)
        self.to_out = conv3d_space(
            cfg.dim + (cfg.channels if cfg.lowres_cond else 0),
            cfg.resolved_channels_out, cfg.final_conv_ksize)

    def forward(self, x, time):
        cfg = self.cfg
        x = self.init_conv(x)
        r = x
        time_hiddens = self.to_time_hiddens(time)
        time_tokens = self.to_time_tokens(time_hiddens).reshape(
            x.shape[0], cfg.num_time_tokens, -1)
        t = self.to_time_cond(time_hiddens)
        c = self.norm_cond(time_tokens)
        mid_c = self.norm_mid_cond(time_tokens)

        if self.init_resnet_block is not None:
            x = self.init_resnet_block(x, t)

        down_hiddens = []
        for pre, init_block, blocks, attn, post in self.downs:
            if pre is not None:
                x = pre(x)
            x = init_block(x, t, c)
            for blk in blocks:
                x = blk(x, t, c)
                down_hiddens.append(x)
            x = attn(x)
            down_hiddens.append(x)
            if post is not None:
                x = post(x)

        x = self.mid_block1(x, t, mid_c)
        if self.mid_attn is not None:
            x = self.mid_attn(x)
        x = self.mid_block2(x, t, mid_c)

        for init_block, blocks, attn, up in self.ups:
            x = torch.cat([x, down_hiddens.pop()], dim=1)
            x = init_block(x, t, c)
            for blk in blocks:
                x = torch.cat([x, down_hiddens.pop()], dim=1)
                x = blk(x, t, c)
            x = attn(x)
            x = up(x)

        x = torch.cat([x, r], dim=1)
        x = self.final_resnet_block(x, t)
        return self.to_out(x)


# ---------------------------------------------------------------------- #
# tests
# ---------------------------------------------------------------------- #

B, T, H, W = 2, 2, 8, 8


def _randomize(module: nn.Module, seed: int = 0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)


def _run_both(cfg: UNet3DConfig, seed=0, atol=2e-4):
    mirror = RefUnet3D(cfg).eval()
    _randomize(mirror, seed)
    sd = mirror.state_dict()

    variables = unet3d_params_from_torch(sd, cfg, strict=True)

    x = np.random.RandomState(seed).randn(B, cfg.channels, T, H, W).astype(np.float32)
    time = np.array([3.0, 7.0], dtype=np.float32)
    with torch.no_grad():
        want = mirror(torch.from_numpy(x), torch.from_numpy(time)).numpy()

    model = UNet3D(cfg)
    got = model.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), jnp.asarray(time)
    )
    got = np.asarray(got).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-3)


def tiny_cfg(**kw):
    base = dict(
        dim=8, dim_mults=(1, 2), channels=3, resnet_groups=4,
        num_resnet_blocks=1, attn_heads=2, attn_dim_head=4,
        self_attn=(False, True), attend_at_middle=True,
    )
    base.update(kw)
    return UNet3DConfig(**base)


def test_unet_import_forward_equivalence():
    """Main path: cross-embed stem, pixel-shuffle upsample, Downsample3D,
    stage + mid attention, cross-attn resnet blocks."""
    _run_both(tiny_cfg())


def test_unet_import_memory_efficient_variant():
    """memory_efficient ordering (pre-downsample + always-on post 1x1 conv,
    reference :535-537/:916-917), cross-embed downsample, nearest upsample,
    no mid attention."""
    _run_both(tiny_cfg(
        memory_efficient=True,
        cross_embed_downsample=True,
        pixel_shuffle_upsample=False,
        attend_at_middle=False,
        self_attn=False,
    ))


def test_unet_import_strict_flags_unknown_keys():
    cfg = tiny_cfg()
    mirror = RefUnet3D(cfg)
    sd = dict(mirror.state_dict())
    sd["downs.0.1.block1.project.weight_extra"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unmapped"):
        unet3d_params_from_torch(sd, cfg, strict=True)


def _decoder_and_sd():
    from dalle2_video_tpu.engine.decoder import VideoDecoder, VideoDecoderConfig

    u = tiny_cfg()
    cfg = VideoDecoderConfig(
        unets=(u, u), frame_sizes=(8, 16), frame_numbers=(T, T),
        timesteps=10, learned_variance=False, unconditional=True,
    )
    dec = VideoDecoder(cfg)
    sd = {}
    for i, ucfg in enumerate(dec.unet_configs):
        mirror = RefUnet3D(ucfg)
        _randomize(mirror, seed=i)
        for k, v in mirror.state_dict().items():
            sd[f"unets.{i}.{k}"] = v
    # scheduler buffers the rebuild recomputes from config
    sd["noise_schedulers.0.betas"] = torch.linspace(1e-4, 2e-2, 10)
    sd["vaes.0.layers"] = torch.zeros(1)
    return dec, sd


def test_decoder_ckpt_import_and_loss():
    dec, sd = _decoder_and_sd()
    params, skipped = decoder_params_from_torch(sd, dec)
    assert set(params) == {"unet_0", "unet_1"}
    assert sorted(skipped) == ["noise_schedulers.0.betas", "vaes.0.layers"]

    # imported params drive the real loss path (shape/geometry proof)
    video = jnp.zeros((1, T, 16, 16, 3))
    loss = dec.loss(params, jax.random.PRNGKey(0), video, unet_number=2)
    assert np.isfinite(float(loss))


def test_trainer_bundle_import():
    from dalle2_video_tpu.train import DecoderTrainer, DecoderTrainerConfig

    dec, sd = _decoder_and_sd()
    trainer = DecoderTrainer(
        dec, DecoderTrainerConfig(lr=1e-4, use_ema=True, bf16_compute=False)
    )

    # EMA shadows = online params shifted by +1 so the transfer is provable
    ema_sd = {}
    for i in (0, 1):
        pref = f"unets.{i}."
        for k, v in sd.items():
            if k.startswith(pref):
                ema_sd[f"{i}.ema_model.{k[len(pref):]}"] = v + 1.0
                ema_sd[f"{i}.online_model.{k[len(pref):]}"] = v
        ema_sd[f"{i}.initted"] = torch.tensor(True)
        ema_sd[f"{i}.step"] = torch.tensor(120 + i)

    bundle = {
        "model": sd,
        "version": "0.0.0",
        "steps": torch.tensor([1200, 340]),
        "optim0": {"state": {}, "param_groups": []},
        "sched0": {},
        "ema": ema_sd,
    }
    state = trainer_state_from_torch(bundle, trainer, jax.random.PRNGKey(0))

    assert np.asarray(state.steps).tolist() == [1200, 340]
    assert int(state.ema[0].step) == 120 and int(state.ema[1].step) == 121
    # shadow == online + 1 for every leaf
    on = jax.tree_util.tree_leaves(state.params["unet_0"])
    sh = jax.tree_util.tree_leaves(state.ema[0].params)
    assert len(on) == len(sh)
    for a, b in zip(on, sh):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a) + 1.0, atol=1e-5)
