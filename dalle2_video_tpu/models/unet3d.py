"""UNet3D — the video denoising network (flagship model).

TPU-native rewrite of reference ``Unet3D`` (/root/reference/dalle2_video/
dalle2_video.py:247-952): cross-embed stem, sinusoidal time conditioning,
CLIP-video-embed conditioning (tokens via cross-attention + projection added
to the time embedding), optional text-encoding conditioning with pad/mask,
classifier-free guidance via learned null embeddings + keep masks,
down/mid/up resnet stacks with joint t*h*w attention at the bottleneck,
skip connections (optionally scaled 2^-0.5), upsample combiner, zero-init
output conv, cascade knobs (lowres_cond / lowres_noise_cond / self_cond).

Deliberate divergences from the shipped reference (SURVEY.md §2e):
  1. video-embed conditioning is ACTIVE when configured (the reference
     swallows `cond_on_image_embeds` into **kwargs and never activates
     `video_to_tokens` — quirk #1); we implement the DALL-E 2 intent.
  2. CFG dropout is driven by explicit keep-mask inputs (computed from a JAX
     PRNG in the engine) instead of global torch RNG inside the module —
     same Bernoulli spec, shard-consistent and jit-safe.
  3. `forward_with_cond_scale`'s two sequential forwards become one
     2x-batched forward (engine/decoder.py) — XLA-friendly CFG.

Checkpointing: `checkpoint_policy` ≙ reference `checkpoint_during_training`
(:867-891), applied as `nn.remat` over resnet blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from dalle2_video_tpu.models.layers import (
    Attention,
    Block3D,
    CrossEmbedLayer3D,
    Downsample3D,
    JointSpaceTimeAttention,
    LinearAttention,
    TemporalAttention,
    NearestUpsample3D,
    PixelShuffleUpsample3D,
    ResnetBlock3D,
    SinusoidalPosEmb,
    SpatialConv,
    TimeConditioning,
    UpsampleCombiner,
    torch_kernel_init,
)


def _remat_policy(name: str):
    """Resolve UNet3DConfig.remat_policy to a jax.checkpoint policy
    (None = jax.checkpoint default: save nothing)."""
    cp = jax.checkpoint_policies
    policies = {
        "nothing": None,
        "dots": cp.dots_saveable,
        "dots_no_batch": cp.dots_with_no_batch_dims_saveable,
        "conv": cp.save_only_these_names("conv_out"),
        "conv_attn": cp.save_only_these_names("conv_out", "attn_out"),
        "conv_dots": cp.save_from_both_policies(
            cp.dots_saveable, cp.save_only_these_names("conv_out")
        ),
    }
    if name not in policies:
        raise ValueError(
            f"unknown remat_policy {name!r}; one of {sorted(policies)}"
        )
    return policies[name]


def _cast_tuple(v, length: int) -> Tuple:
    if isinstance(v, (tuple, list)):
        assert len(v) == length, f"expected {length} entries, got {v}"
        return tuple(v)
    return (v,) * length


@dataclasses.dataclass(frozen=True)
class UNet3DConfig:
    """Static hyperparameters (reference Unet3D.__init__ signature,
    dalle2_video.py:248-291). Cascade re-slotting = dataclasses.replace
    (reference cast_model_parameters, :652-681)."""

    dim: int = 64
    video_embed_dim: Optional[int] = None
    text_embed_dim: Optional[int] = None
    cond_dim: Optional[int] = None
    num_video_tokens: int = 4  # reference num_image_tokens
    num_time_tokens: int = 2
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 3
    channels_out: Optional[int] = None
    self_attn: Union[bool, Tuple[bool, ...]] = False
    attn_dim_head: int = 32
    attn_heads: int = 16
    lowres_cond: bool = False
    lowres_noise_cond: bool = False
    self_cond: bool = False
    sparse_attn: bool = False
    cosine_sim_cross_attn: bool = False
    cosine_sim_self_attn: bool = False
    attend_at_middle: bool = True
    cond_on_text_encodings: bool = False
    max_text_len: int = 256
    cond_on_video_embeds: bool = False
    add_video_embeds_to_time: bool = True
    init_dim: Optional[int] = None
    init_conv_ksize: int = 7
    resnet_groups: Union[int, Tuple[int, ...]] = 8
    num_resnet_blocks: Union[int, Tuple[int, ...]] = 2
    init_cross_embed: bool = True
    init_cross_embed_kernel_sizes: Tuple[int, ...] = (3, 7, 15)
    cross_embed_downsample: bool = False
    cross_embed_downsample_kernel_sizes: Tuple[int, ...] = (2, 4)
    memory_efficient: bool = False
    scale_skip_connection: bool = False
    pixel_shuffle_upsample: bool = True
    final_conv_ksize: int = 1
    combine_upsample_fmaps: bool = False
    checkpoint_during_training: bool = False
    # Saved-residual policy for the rematted resnet blocks (active only when
    # checkpoint_during_training and the engine passes enable_checkpoint=True).
    # The policy space is the byte-reduction lever for this bandwidth-bound
    # model (docs/PERF.md r4 remat sweep):
    #   "nothing"   — jax.checkpoint default: save block inputs only,
    #                 recompute everything (convs included) in the backward
    #   "dots"      — save dot_general results (Dense/attention matmuls)
    #   "conv"      — save tensors tagged checkpoint_name "conv_out": conv
    #                 results are materialized in the forward anyway, so
    #                 saving them is free; the GN/FiLM/SiLU interiors and
    #                 their f32 residuals are recomputed fused into the bwd
    #   "conv_attn" — "conv" plus attention outputs ("attn_out")
    #   "conv_dots" — union of "conv" and "dots"
    remat_policy: str = "nothing"
    # False -> spatial-only (per-frame) attention everywhere; used by
    # UnetTemporalConv (frame-wise 2D unet + temporal conv mixer)
    joint_time_attention: bool = True
    # "xla" | "flash" | "auto" | "sp": flash routes the joint attention
    # through the Pallas streaming MQA kernel (custom VJP — trains); auto
    # picks flash at >=4096 joint tokens where it measured faster than XLA
    # in the full train step (docs/PERF.md probe21), XLA below. "sp" shards
    # the TOKEN axis over the mesh's 'model' axis (flash kernel per shard,
    # kv gathered over ICI — parallel/sp_attention.py) when a mesh is
    # active (parallel.mesh.active_mesh, set by the sharded step factories);
    # otherwise it degrades to the auto rule.
    attention_impl: str = "xla"
    # "xla" | "pallas": pallas fuses GroupNorm+FiLM+SiLU (custom VJP)
    groupnorm_impl: str = "xla"
    # "pallas_small": pixel-pair-packed Pallas fwd at small-spatial 3x3 sites
    spatial_conv_impl: str = "xla"
    # "xla" | "flash": fused Pallas cross-attention. Separate from
    # attention_impl because it measured SLOWER than the context-major XLA
    # path on v5e (17.7 vs 30 sampling steps/s — it breaks projection-chain
    # fusion; docs/PERF.md); opt-in only.
    cross_attention_impl: str = "xla"
    # factorized per-pixel temporal attention after each attention site
    # (reference future work, README.md:82 — needed for temporal SR quality)
    temporal_attention: bool = False
    # "unet3d" | "temporal_conv" — which denoiser architecture VideoDecoder
    # instantiates for this cascade slot (reference accepts
    # Union[Unet3D, UnetTemporalConv], dalle2_video.py:1335)
    arch: str = "unet3d"

    # ------------------------------------------------------------------ #
    def cast_for_cascade(
        self,
        *,
        lowres_cond: bool,
        lowres_noise_cond: bool,
        channels: int,
        channels_out: int,
        cond_on_video_embeds: bool,
        cond_on_text_encodings: bool,
    ) -> "UNet3DConfig":
        """Reference cast_model_parameters (:652-681), with quirk #1 fixed:
        the video-embed flag actually reaches the config."""
        return dataclasses.replace(
            self,
            lowres_cond=lowres_cond,
            lowres_noise_cond=lowres_noise_cond,
            channels=channels,
            channels_out=channels_out,
            cond_on_video_embeds=cond_on_video_embeds,
            cond_on_text_encodings=cond_on_text_encodings,
        )

    # derived quantities ------------------------------------------------ #
    @property
    def num_stages(self) -> int:
        return len(self.dim_mults)

    @property
    def resolved_cond_dim(self) -> int:
        return self.cond_dim if self.cond_dim is not None else self.dim

    @property
    def time_cond_dim(self) -> int:
        return self.dim * 4

    @property
    def resolved_init_dim(self) -> int:
        return self.init_dim if self.init_dim is not None else self.dim

    @property
    def resolved_channels_out(self) -> int:
        return self.channels_out if self.channels_out is not None else self.channels

    @property
    def stage_dims(self) -> Tuple[Tuple[int, int], ...]:
        dims = [self.resolved_init_dim, *(self.dim * m for m in self.dim_mults)]
        return tuple(zip(dims[:-1], dims[1:]))


class UNet3D(nn.Module):
    """See module docstring. Input/output layout: (B, T, H, W, C)."""

    cfg: UNet3DConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time: jnp.ndarray,
        *,
        video_embed: Optional[jnp.ndarray] = None,
        lowres_cond_video: Optional[jnp.ndarray] = None,
        lowres_noise_level: Optional[jnp.ndarray] = None,
        text_encodings: Optional[jnp.ndarray] = None,
        video_keep_mask: Optional[jnp.ndarray] = None,
        text_keep_mask: Optional[jnp.ndarray] = None,
        self_cond: Optional[jnp.ndarray] = None,
        enable_checkpoint: bool = False,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b = x.shape[0]
        cond_dim = cfg.resolved_cond_dim
        time_cond_dim = cfg.time_cond_dim

        if video_keep_mask is None:
            video_keep_mask = jnp.ones((b,), dtype=bool)
        if text_keep_mask is None:
            text_keep_mask = jnp.ones((b,), dtype=bool)

        # --- input channel assembly (reference :736-747) ---------------- #
        if cfg.self_cond:
            sc = self_cond if self_cond is not None else jnp.zeros_like(x)
            x = jnp.concatenate([x, sc], axis=-1)
        if cfg.lowres_cond:
            assert lowres_cond_video is not None, "lowres conditioning video required"
            x = jnp.concatenate([x, lowres_cond_video], axis=-1)

        # --- stem (reference :320-335) ----------------------------------- #
        if cfg.init_cross_embed:
            x = CrossEmbedLayer3D(
                cfg.resolved_init_dim,
                kernel_sizes=cfg.init_cross_embed_kernel_sizes,
                stride=1,
                name="init_conv",
            )(x)
        else:
            x = SpatialConv(
                cfg.resolved_init_dim, cfg.init_conv_ksize, name="init_conv"
            )(x)
        r = x  # final residual (reference :751)

        # --- time conditioning (reference :348-357, :753-761) ------------ #
        time_tokens, t = TimeConditioning(
            cfg.dim,
            cond_dim,
            time_cond_dim,
            num_time_tokens=cfg.num_time_tokens,
            name="time_cond",
        )(time)

        # --- lowres noise conditioning (Imagen; reference :388-400, :765-769)
        if cfg.lowres_noise_cond:
            assert lowres_noise_level is not None
            ln = SinusoidalPosEmb(cfg.dim, name="lowres_sinu")(lowres_noise_level)
            ln = nn.Dense(time_cond_dim, kernel_init=torch_kernel_init, name="lowres_dense1")(ln)
            ln = nn.gelu(ln, approximate=False)
            ln = nn.Dense(time_cond_dim, kernel_init=torch_kernel_init, name="lowres_dense2")(ln)
            t = t + ln

        # --- CLIP video embedding conditioning (reference :359-372, :784-809;
        #     quirk #1 fixed: tokens path active) -------------------------- #
        # video_embed is (b, d) — the reference's single global embed — or
        # (b, k, d): k PER-FRAME embeds (DALLE2Video temporal_emb mode).
        # Per-frame embeds become one conditioning token EACH (information-
        # preserving, beyond the reference whose embed conditioning is
        # inert — SURVEY §2e.1); the add-to-time path uses their mean.
        video_tokens = None
        if cfg.cond_on_video_embeds:
            assert video_embed is not None, "video_embed required"
            per_frame = video_embed.ndim == 3
            if cfg.add_video_embeds_to_time:
                ve_global = video_embed.mean(axis=1) if per_frame else video_embed
                vh = nn.Dense(time_cond_dim, kernel_init=torch_kernel_init, name="to_video_hiddens")(ve_global)
                vh = nn.gelu(vh, approximate=False)
                null_vh = self.param(
                    "null_video_hiddens", nn.initializers.normal(1.0), (1, time_cond_dim)
                )
                vh = jnp.where(video_keep_mask[:, None], vh, null_vh)
                t = t + vh

            if per_frame:
                # one cond token per frame embed: (b, k, d) -> (b, k, cond).
                # Cross-attention is permutation-invariant over kv tokens,
                # so add a sinusoidal position over the frame axis — frame
                # ORDER is part of the conditioning, not just the set.
                vt = nn.Dense(
                    cond_dim, kernel_init=torch_kernel_init,
                    name="video_frame_to_token",
                )(video_embed)
                k_frames = video_embed.shape[1]
                frame_pos = SinusoidalPosEmb(cond_dim)(
                    jnp.arange(k_frames, dtype=jnp.float32)
                )  # (k, cond_dim)
                vt = vt + frame_pos[None].astype(vt.dtype)
                null_vt = self.param(
                    "null_video_frame_token",
                    nn.initializers.normal(1.0),
                    (1, 1, cond_dim),
                )  # one learned null broadcast over the frame axis
                null_vt = jnp.broadcast_to(null_vt, vt.shape)
            else:
                if cfg.video_embed_dim is not None and cfg.video_embed_dim != cond_dim:
                    vt = nn.Dense(
                        cond_dim * cfg.num_video_tokens,
                        kernel_init=torch_kernel_init,
                        name="video_to_tokens",
                    )(video_embed).reshape(b, cfg.num_video_tokens, cond_dim)
                else:
                    # identity path: broadcast the embed over the token axis
                    vt = jnp.broadcast_to(
                        video_embed[:, None, :], (b, cfg.num_video_tokens, cond_dim)
                    )
                null_vt = self.param(
                    "null_video_embed",
                    nn.initializers.normal(1.0),
                    (1, cfg.num_video_tokens, cond_dim),
                )
            video_tokens = jnp.where(video_keep_mask[:, None, None], vt, null_vt)

        # --- text encodings conditioning (reference :815-848) ------------ #
        text_tokens = None
        if cfg.cond_on_text_encodings:
            # reference asserts presence (:816); silently dropping the
            # tokens would change the conditioning sequence length and
            # train/serve a different model than configured
            assert text_encodings is not None, (
                "cond_on_text_encodings=True but no text_encodings passed"
            )
            assert cfg.text_embed_dim is not None
            assert text_encodings.shape[-1] == cfg.text_embed_dim
            text_mask = jnp.any(text_encodings != 0.0, axis=-1)  # (b, n)
            tt = nn.Dense(cond_dim, kernel_init=torch_kernel_init, name="text_to_cond")(text_encodings)
            tt = tt[:, : cfg.max_text_len]
            text_mask = text_mask[:, : cfg.max_text_len]
            remainder = cfg.max_text_len - tt.shape[1]
            if remainder > 0:
                tt = jnp.pad(tt, ((0, 0), (0, remainder), (0, 0)))
                text_mask = jnp.pad(text_mask, ((0, 0), (0, remainder)))
            keep = text_mask & text_keep_mask[:, None]  # (b, max_text_len)
            null_tt = self.param(
                "null_text_embed",
                nn.initializers.normal(1.0),
                (1, cfg.max_text_len, cond_dim),
            )
            text_tokens = jnp.where(keep[:, :, None], tt, null_tt)

        # --- conditioning token sets c / mid_c (reference :850-865) ------ #
        c = time_tokens
        if video_tokens is not None:
            c = jnp.concatenate([c, video_tokens], axis=1)
        mid_c = c if text_tokens is None else jnp.concatenate([c, text_tokens], axis=1)
        c = nn.LayerNorm(name="norm_cond")(c)
        mid_c = nn.LayerNorm(name="norm_mid_cond")(mid_c)

        # keep the conditioning streams in the activation dtype — otherwise a
        # f32 time embedding re-promotes every FiLM-conditioned fmap to f32
        # and silently disables bf16 compute
        t = t.astype(x.dtype)
        c = c.astype(x.dtype)
        mid_c = mid_c.astype(x.dtype)

        # --- stage plumbing ---------------------------------------------- #
        in_out = cfg.stage_dims
        num_stages = len(in_out)
        self_attn = _cast_tuple(cfg.self_attn, num_stages)
        groups_per = _cast_tuple(cfg.resnet_groups, num_stages)
        nblocks_per = _cast_tuple(cfg.num_resnet_blocks, num_stages)
        skip_scale = (2**-0.5) if cfg.scale_skip_connection else 1.0

        use_remat = cfg.checkpoint_during_training and enable_checkpoint
        Resnet = (
            nn.remat(ResnetBlock3D, policy=_remat_policy(cfg.remat_policy))
            if use_remat
            else ResnetBlock3D
        )

        def maybe_temporal_attn(x, dim_layer: int, name: str):
            if cfg.temporal_attention:
                return TemporalAttention(
                    dim_layer, heads=cfg.attn_heads, dim_head=cfg.attn_dim_head,
                    cosine_sim=cfg.cosine_sim_self_attn, name=name,
                )(x)
            return x

        def make_stage_attn(dim_layer: int, layer_self_attn: bool, name: str):
            if layer_self_attn:
                return JointSpaceTimeAttention(
                    dim_layer,
                    heads=cfg.attn_heads,
                    dim_head=cfg.attn_dim_head,
                    cosine_sim=cfg.cosine_sim_self_attn,
                    joint_time=cfg.joint_time_attention,
                    impl=cfg.attention_impl,
                    name=name,
                )
            if cfg.sparse_attn:
                return LinearAttention(
                    dim_layer, heads=cfg.attn_heads, dim_head=cfg.attn_dim_head, name=name
                )
            return None

        def make_downsample(dim_out: int, name: str):
            if cfg.cross_embed_downsample:
                return CrossEmbedLayer3D(
                    dim_out,
                    kernel_sizes=cfg.cross_embed_downsample_kernel_sizes,
                    stride=2,
                    name=name,
                )
            return Downsample3D(dim_out, name=name)

        Upsample = (
            PixelShuffleUpsample3D if cfg.pixel_shuffle_upsample else NearestUpsample3D
        )

        # memory-efficient variant prepends a plain resnet (reference :467-476)
        if cfg.memory_efficient:
            x = Resnet(
                cfg.resolved_init_dim,
                time_cond_dim=time_cond_dim,
                groups=groups_per[0],
                norm_impl=cfg.groupnorm_impl,
                conv_impl=cfg.spatial_conv_impl,
                attn_impl=cfg.cross_attention_impl,
                name="init_resnet_block",
            )(x, t)

        # --- down path (reference :487-561, :903-917) -------------------- #
        down_hiddens = []
        for ind, ((dim_in, dim_out), groups, n_blocks, layer_sa) in enumerate(
            zip(in_out, groups_per, nblocks_per, self_attn)
        ):
            is_first = ind == 0
            is_last = ind >= num_stages - 1
            layer_cond_dim = cond_dim if not is_first else None
            dim_layer = dim_out if cfg.memory_efficient else dim_in

            if cfg.memory_efficient:
                x = make_downsample(dim_out, name=f"down{ind}_pre")(x)

            x = Resnet(
                dim_layer,
                time_cond_dim=time_cond_dim,
                groups=groups,
                norm_impl=cfg.groupnorm_impl,
                conv_impl=cfg.spatial_conv_impl,
                attn_impl=cfg.cross_attention_impl,
                name=f"down{ind}_init_block",
            )(x, t)

            for j in range(n_blocks):
                x = Resnet(
                    dim_layer,
                    cond_dim=layer_cond_dim,
                    time_cond_dim=time_cond_dim,
                    groups=groups,
                    cosine_sim_cross_attn=cfg.cosine_sim_cross_attn,
                    norm_impl=cfg.groupnorm_impl,
                    conv_impl=cfg.spatial_conv_impl,
                    attn_impl=cfg.cross_attention_impl,
                    name=f"down{ind}_block{j}",
                )(x, t, c)
                down_hiddens.append(x)

            attn = make_stage_attn(dim_layer, layer_sa, f"down{ind}_attn")
            if attn is not None:
                x = attn(x)
            x = maybe_temporal_attn(x, dim_layer, f"down{ind}_temporal_attn")
            down_hiddens.append(x)

            if not is_last and not cfg.memory_efficient:
                x = make_downsample(dim_out, name=f"down{ind}_post")(x)
            else:
                # reference always builds the 1x1 post conv when the
                # downsample branch isn't taken — including in
                # memory_efficient mode (dalle2_video.py:535-537, applied
                # :916-917); dim_layer == dim_out there
                x = SpatialConv(dim_out, 1, name=f"down{ind}_post")(x)

        # --- bottleneck: joint t*h*w attention (reference :563-581, :919-924)
        mid_dim = in_out[-1][1]
        x = Resnet(
            mid_dim,
            cond_dim=cond_dim,
            time_cond_dim=time_cond_dim,
            groups=groups_per[-1],
            cosine_sim_cross_attn=cfg.cosine_sim_cross_attn,
            norm_impl=cfg.groupnorm_impl,
            conv_impl=cfg.spatial_conv_impl,
            attn_impl=cfg.cross_attention_impl,
            name="mid_block1",
        )(x, t, mid_c)
        if cfg.attend_at_middle:
            x = JointSpaceTimeAttention(
                mid_dim,
                heads=cfg.attn_heads,
                dim_head=cfg.attn_dim_head,
                cosine_sim=cfg.cosine_sim_self_attn,
                joint_time=cfg.joint_time_attention,
                impl=cfg.attention_impl,
                name="mid_attn",
            )(x)
            x = maybe_temporal_attn(x, mid_dim, "mid_temporal_attn")
        x = Resnet(
            mid_dim,
            cond_dim=cond_dim,
            time_cond_dim=time_cond_dim,
            groups=groups_per[-1],
            cosine_sim_cross_attn=cfg.cosine_sim_cross_attn,
            norm_impl=cfg.groupnorm_impl,
            conv_impl=cfg.spatial_conv_impl,
            attn_impl=cfg.cross_attention_impl,
            name="mid_block2",
        )(x, t, mid_c)

        # --- up path (reference :583-617, :926-941) ----------------------- #
        up_hiddens = []
        for ind, ((dim_in, dim_out), groups, n_blocks, layer_sa) in enumerate(
            zip(
                reversed(in_out),
                reversed(groups_per),
                reversed(nblocks_per),
                reversed(self_attn),
            )
        ):
            is_last = ind >= num_stages - 1
            layer_cond_dim = cond_dim if not is_last else None

            x = jnp.concatenate([x, down_hiddens.pop() * skip_scale], axis=-1)
            x = Resnet(
                dim_out,
                cond_dim=layer_cond_dim,
                time_cond_dim=time_cond_dim,
                groups=groups,
                cosine_sim_cross_attn=cfg.cosine_sim_cross_attn,
                norm_impl=cfg.groupnorm_impl,
                conv_impl=cfg.spatial_conv_impl,
                attn_impl=cfg.cross_attention_impl,
                name=f"up{ind}_init_block",
            )(x, t, c)

            for j in range(n_blocks):
                x = jnp.concatenate([x, down_hiddens.pop() * skip_scale], axis=-1)
                x = Resnet(
                    dim_out,
                    cond_dim=layer_cond_dim,
                    time_cond_dim=time_cond_dim,
                    groups=groups,
                    cosine_sim_cross_attn=cfg.cosine_sim_cross_attn,
                    norm_impl=cfg.groupnorm_impl,
                    conv_impl=cfg.spatial_conv_impl,
                    attn_impl=cfg.cross_attention_impl,
                    name=f"up{ind}_block{j}",
                )(x, t, c)

            attn = make_stage_attn(dim_out, layer_sa, f"up{ind}_attn")
            if attn is not None:
                x = attn(x)
            x = maybe_temporal_attn(x, dim_out, f"up{ind}_temporal_attn")
            up_hiddens.append(x)

            if not is_last or cfg.memory_efficient:
                x = Upsample(dim_in, name=f"up{ind}_upsample")(x)

        # --- head (reference :619-648, :943-951) -------------------------- #
        x = UpsampleCombiner(
            cfg.dim, enabled=cfg.combine_upsample_fmaps, name="upsample_combiner"
        )(x, up_hiddens)
        x = jnp.concatenate([x, r], axis=-1)
        x = Resnet(
            cfg.dim,
            time_cond_dim=time_cond_dim,
            groups=groups_per[0],
            norm_impl=cfg.groupnorm_impl,
            conv_impl=cfg.spatial_conv_impl,
            attn_impl=cfg.cross_attention_impl,
            name="final_resnet_block",
        )(x, t)
        if cfg.lowres_cond:
            x = jnp.concatenate([x, lowres_cond_video], axis=-1)
        return SpatialConv(
            cfg.resolved_channels_out,
            cfg.final_conv_ksize,
            kernel_init=nn.initializers.zeros,  # zero-init out conv (:644)
            name="to_out",
        )(x)
