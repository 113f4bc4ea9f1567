"""VideoDecoder — cascaded DDPM video diffusion engine.

TPU-native rewrite of reference ``VideoDecoder`` (/root/reference/
dalle2_video/dalle2_video.py:1169-2299): per-unet noise schedules
(cosine...linear default), frame_sizes/frame_numbers ladders, learned
variance + VLB, p2 reweighting, CFG drop probabilities (video 0.1 / text
0.5), dynamic thresholding, Imagen lowres blur/noise conditioning, DDPM
ancestral + DDIM sampling, optional latent diffusion via a VAE per stage.

TPU-first design:
  * training loss and per-stage sampling are pure functions of
    (params, rng, arrays) — jit/pjit them whole; all unets stay resident
    in (sharded) HBM, replacing the reference's CPU<->GPU unet swapping
    (``one_unet_in_gpu``, :1508-1529)
  * the denoising loop is a single ``lax.scan`` — one compiled program for
    all 1000 steps, zero host round-trips
  * classifier-free guidance runs as ONE 2x-batched forward instead of the
    reference's two sequential forwards (:683-692)
  * every random draw (timesteps, noise, CFG keep masks, self-cond coin,
    blur coin) comes from an explicit, splittable PRNG key

Deliberate divergences (SURVEY.md §2e, implemented as intended semantics):
  quirk #1  embed conditioning actually active on the base unet
  quirk #2  DDIM path works for video (the reference's is unreachable/broken)
  quirk #3  training-time text-conditioning assert fixed (mis-parenthesized
            at reference :2242)
  + parse_unet_output splits the CHANNEL axis (reference :1500-1506 splits
    torch dim=2 = time — latent bug, never exercised since shipped config
    has learned_variance=False)
  + frame_numbers ladder actually resamples time (temporal SR), instead of
    being inert (quirk #6)
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from dalle2_video_tpu.diffusion import (
    NAT,
    DiffusionSchedule,
    discretized_gaussian_log_likelihood,
    normal_kl,
)
from dalle2_video_tpu.engine.conditioner import (
    LowresConditionerConfig,
    lowres_condition,
    make_noise_schedule,
    noise_video,
)
from dalle2_video_tpu.models.unet3d import UNet3D, UNet3DConfig
from dalle2_video_tpu.models.vae import NullVAE
from dalle2_video_tpu.utils import keys as keyutil
from dalle2_video_tpu.ops.video import (
    paired_random_crop,
    resize_video,
    resize_video_time,
)


def ddim_time_pairs(total: int, timesteps: int):
    """The static DDIM (t_now, t_next) grid (reference :1780-1785),
    descending, ending at t_next = -1 (alpha_bar = 1). Shared by the
    sampling loop and the progressive-distillation trainer so the student
    trains on exactly the grid it will sample with."""
    times = np.linspace(-1, total - 1, timesteps + 1).astype(int)
    times = list(reversed(times.tolist()))
    return [(a, b) for a, b in zip(times[:-1], times[1:]) if a > b]


def _cast_tuple(v, length: int):
    if isinstance(v, (tuple, list)):
        out = tuple(v)
        assert len(out) == length, f"expected {length} entries, got {v}"
        return out
    return (v,) * length


def _lowres_flag_tuple(v, n: int) -> Tuple:
    """Per-SR-unet flag (reference :1310-1330 semantics: the base unet has
    no lowres conditioning). Accepts a scalar, a length n-1 tuple (one per
    SR unet), or a full length-n tuple whose base entry must be falsy —
    rejecting the silent shift-and-truncate a mis-sized tuple used to get."""
    if isinstance(v, (tuple, list)):
        v = tuple(v)
        if len(v) == n:
            assert not v[0], (
                "lowres conditioning applies to SR unets only; a length-n "
                f"tuple must start with False, got {v}"
            )
            v = v[1:]
        assert len(v) == n - 1, f"expected {n - 1} (or {n}) entries, got {v}"
        return v
    return (v,) * (n - 1)


def _pad_tuple(t: Tuple, length: int, fill):
    return t + (fill,) * (length - len(t))


@dataclasses.dataclass(frozen=True)
class VideoDecoderConfig:
    """Static cascade configuration (reference __init__, :1170-1238)."""

    unets: Tuple[UNet3DConfig, ...]
    frame_sizes: Tuple[int, ...]
    frame_numbers: Tuple[int, ...]
    channels: int = 3
    timesteps: int = 1000
    sample_timesteps: Union[None, int, Tuple[Optional[int], ...]] = None
    video_cond_drop_prob: float = 0.1
    text_cond_drop_prob: float = 0.5
    loss_type: str = "l2"
    beta_schedule: Union[None, str, Tuple[str, ...]] = None
    predict_x_start: Union[bool, Tuple[bool, ...]] = False
    # override: predict x0 exactly on latent-diffusion stages (reference
    # predict_x_start_for_latent_diffusion, :1466-1470)
    predict_x_start_for_latent_diffusion: bool = False
    predict_v: Union[bool, Tuple[bool, ...]] = False
    learned_variance: Union[bool, Tuple[bool, ...]] = True
    learned_variance_constrain_frac: bool = False
    vb_loss_weight: float = 0.001
    unconditional: bool = False
    auto_normalize_video: bool = True
    use_dynamic_thres: bool = False
    dynamic_thres_percentile: float = 0.95
    p2_loss_weight_gamma: Union[float, Tuple[float, ...]] = 0.0
    p2_loss_weight_k: float = 1.0
    ddim_sampling_eta: float = 0.0
    use_noise_for_lowres_cond: Union[bool, Tuple[bool, ...]] = False
    use_blur_for_lowres_cond: Union[bool, Tuple[bool, ...]] = True
    lowres_downsample_first: bool = True
    blur_prob: float = 0.5
    blur_sigma: float = 0.6
    blur_kernel_size: int = 3
    lowres_noise_sample_level: float = 0.2
    clip_denoised: bool = True
    random_crop_sizes: Union[None, int, Tuple[Optional[int], ...]] = None
    # route the sampling path's joint attention through the Pallas flash MQA
    # kernel (ops/pallas/flash_mqa.py); training keeps the XLA attention
    # (needs autodiff)
    flash_attention_sampling: bool = False
    # mixed-precision SAMPLING: run the denoiser forward in this dtype
    # ("bfloat16") while all diffusion math (posterior, thresholding, noise
    # injection) stays f32 — the inference-side twin of
    # DecoderTrainerConfig.bf16_compute. None = full f32 (reference parity).
    sample_compute_dtype: Optional[str] = None
    # few-step sampler used when sample_timesteps < timesteps:
    #   "ddim"  — eta-controlled DDIM (reference-intended behavior)
    #   "dpmpp" — DPM-Solver++(2M): deterministic second-order multistep in
    #             data-prediction space (Lu et al. 2022), typically matches
    #             DDIM at ~4x fewer steps; same ddim_time_pairs grid
    sampler: str = "ddim"
    # CFG rescale phi (Lin et al. 2023 §3.4, as in diffusers'
    # rescale_noise_cfg): counteracts the guided prediction's variance
    # blow-up at high cond_scale by rescaling its per-sample std back to
    # the conditional branch's, then blending with weight phi. 0 = off
    # (reference parity). Applied to the prediction channels only (learned
    # variance channels keep the plain guided combine).
    cfg_rescale: float = 0.0

    @property
    def num_unets(self) -> int:
        return len(self.unets)


class VideoDecoder:
    """Engine object: holds resolved per-unet configs, modules and schedules.

    Construction mirrors reference :1290-1480 (validation + per-unet
    resolution of tuple-ish knobs + cascade re-casting of each unet).
    """

    def __init__(self, config: VideoDecoderConfig, vaes: Optional[Sequence] = None):
        cfg = config
        n = cfg.num_unets
        assert n == len(cfg.frame_sizes) == len(cfg.frame_numbers)
        assert tuple(cfg.frame_sizes) == tuple(sorted(cfg.frame_sizes))

        self.config = cfg
        self.vaes = tuple(vaes) if vaes is not None else tuple(
            NullVAE(channels=cfg.channels) for _ in range(n)
        )
        assert len(self.vaes) == n

        # learned variance: scalar -> first unet only (reference :1300-1305)
        lv = cfg.learned_variance
        self.learned_variance = _pad_tuple(
            (lv,) if isinstance(lv, bool) else tuple(lv), n, False
        )
        if cfg.predict_x_start_for_latent_diffusion:
            self.predict_x_start = tuple(v.is_latent for v in self.vaes)
        else:
            self.predict_x_start = _cast_tuple(cfg.predict_x_start, n)
        self.predict_v = _cast_tuple(cfg.predict_v, n)
        self.sample_timesteps = _cast_tuple(cfg.sample_timesteps, n)
        self.random_crop_sizes = _cast_tuple(cfg.random_crop_sizes, n)
        assert self.random_crop_sizes[0] is None, "no random crop for base unet"

        # lowres conditioning flags (reference :1310-1330)
        unoise = _lowres_flag_tuple(cfg.use_noise_for_lowres_cond, n) if n > 1 else ()
        ublur = _lowres_flag_tuple(cfg.use_blur_for_lowres_cond, n) if n > 1 else ()
        self.use_noise_for_lowres = (False, *unoise)
        self.use_blur_for_lowres = (False, *ublur)
        assert n == 1 or all(
            nz or bl
            for nz, bl in zip(self.use_noise_for_lowres[1:], self.use_blur_for_lowres[1:])
        )

        # beta schedules (reference :1367-1374)
        bs = cfg.beta_schedule
        if bs is None:
            bs = ("cosine", *("cosine",) * max(n - 2, 0), *("linear",) * int(n > 1))
        bs = _cast_tuple(bs, n)
        p2g = _cast_tuple(cfg.p2_loss_weight_gamma, n)
        self.schedules = tuple(
            DiffusionSchedule.create(
                b, cfg.timesteps, cfg.loss_type, g, cfg.p2_loss_weight_k
            )
            for b, g in zip(bs, p2g)
        )

        # re-cast each unet for its cascade slot (reference :1332-1358)
        unet_cfgs = []
        for i, (ucfg, vae, lv_i, lowres_noise) in enumerate(
            zip(cfg.unets, self.vaes, self.learned_variance, self.use_noise_for_lowres)
        ):
            is_first = i == 0
            unet_channels = vae.encoded_dim
            unet_cfgs.append(
                ucfg.cast_for_cascade(
                    lowres_cond=not is_first,
                    lowres_noise_cond=lowres_noise,
                    channels=unet_channels,
                    channels_out=unet_channels * (2 if lv_i else 1),
                    cond_on_video_embeds=not cfg.unconditional and is_first,
                    cond_on_text_encodings=not cfg.unconditional
                    and ucfg.cond_on_text_encodings,
                )
            )
        self.unet_configs = tuple(unet_cfgs)

        def build_unet(c: UNet3DConfig):
            if c.arch == "temporal_conv":
                from dalle2_video_tpu.models.unet_temporal import UnetTemporalConv

                return UnetTemporalConv(c)
            return UNet3D(c)

        self.unets = tuple(build_unet(c) for c in self.unet_configs)
        # sampling-path unets share params with self.unets (identical module
        # structure/names), only the attention impl differs
        if cfg.flash_attention_sampling:
            self.sample_unets = tuple(
                build_unet(dataclasses.replace(c, attention_impl="flash"))
                for c in self.unet_configs
            )
        else:
            self.sample_unets = self.unets

        # lowres conditioner configs per SR stage (reference :1436-1460)
        self.lowres_configs: Tuple[Optional[LowresConditionerConfig], ...] = tuple(
            None
            if i == 0
            else LowresConditionerConfig(
                downsample_first=cfg.lowres_downsample_first,
                use_blur=self.use_blur_for_lowres[i],
                blur_prob=cfg.blur_prob,
                blur_sigma=cfg.blur_sigma,
                blur_kernel_size=cfg.blur_kernel_size,
                use_noise=self.use_noise_for_lowres[i],
                input_video_range=(0.0, 1.0) if cfg.auto_normalize_video else (-1.0, 1.0),
                auto_normalize=cfg.auto_normalize_video,
            )
            for i in range(n)
        )
        self.lowres_noise_schedule = make_noise_schedule()

        self.can_classifier_guidance = (
            cfg.video_cond_drop_prob > 0.0 or cfg.text_cond_drop_prob > 0.0
        )
        self.condition_on_text_encodings = any(
            c.cond_on_text_encodings for c in self.unet_configs
        )
        # per-stage compiled samplers (sample(jit_stages=True)): one
        # PROGRAM PER CASCADE STAGE instead of one whole-cascade jit — the
        # axon remote-compile service caps the uploaded program size (HTTP
        # 413 on the full prior+cascade+inpaint graph), and per-stage
        # programs also re-use compilations across entry points
        self._stage_jit_cache: Dict[tuple, Any] = {}

    # ------------------------------------------------------------------ #
    # params
    # ------------------------------------------------------------------ #
    def init_params(self, rng: jax.Array, batch_size: int = 1,
                    per_frame_embeds: bool = False) -> Dict[str, Any]:
        """Initialize all unet (and VAE) params. Tiny dummy shapes: UNet3D is
        fully convolutional + token attention, so params are shape-agnostic
        in (T, H, W). ``per_frame_embeds=True`` initializes the per-frame
        token conditioning path ((b, k, d) video embeds — DALLE2Video
        temporal_emb mode) instead of the single-embed path."""
        cfg = self.config
        params: Dict[str, Any] = {}
        keys = jax.random.split(rng, 2 * cfg.num_unets)
        for i, (unet, ucfg, vae) in enumerate(
            zip(self.unets, self.unet_configs, self.vaes)
        ):
            t, s = 2, 16
            x = jnp.zeros((batch_size, t, s, s, ucfg.channels))
            time = jnp.zeros((batch_size,), jnp.int32)
            kwargs: Dict[str, Any] = {}
            if ucfg.cond_on_video_embeds:
                emb_shape = (
                    (batch_size, 2, ucfg.video_embed_dim)
                    if per_frame_embeds else (batch_size, ucfg.video_embed_dim)
                )
                kwargs["video_embed"] = jnp.zeros(emb_shape)
            if ucfg.lowres_cond:
                kwargs["lowres_cond_video"] = jnp.zeros_like(x)
            if ucfg.lowres_noise_cond:
                kwargs["lowres_noise_level"] = jnp.zeros((batch_size,), jnp.int32)
            if ucfg.cond_on_text_encodings:
                kwargs["text_encodings"] = jnp.zeros((batch_size, 4, ucfg.text_embed_dim))
            params[f"unet_{i}"] = unet.init(keys[2 * i], x, time, **kwargs)
            vp = vae.init_params(keys[2 * i + 1])
            if vp is not None:
                params[f"vae_{i}"] = vp
        return params

    # ------------------------------------------------------------------ #
    # helpers
    # ------------------------------------------------------------------ #
    def _normalize(self, x):
        return x * 2.0 - 1.0 if self.config.auto_normalize_video else x

    def _unnormalize(self, x):
        return (x + 1.0) * 0.5 if self.config.auto_normalize_video else x

    @staticmethod
    def parse_unet_output(learned_variance: bool, output: jnp.ndarray):
        """Split (pred, var_interp_frac) along channels. Divergence: reference
        :1500-1506 chunks torch dim=2 (time) — latent bug, see module doc."""
        if not learned_variance:
            return output, None
        return jnp.split(output, 2, axis=-1)

    def dynamic_threshold(self, x: jnp.ndarray) -> jnp.ndarray:
        """Static clamp or Imagen dynamic thresholding (reference :1530-1549)."""
        if not self.config.use_dynamic_thres:
            return jnp.clip(x, -1.0, 1.0)
        b = x.shape[0]
        flat = jnp.abs(x.reshape(b, -1))
        s = jnp.quantile(flat, self.config.dynamic_thres_percentile, axis=-1)
        s = jnp.maximum(s, 1.0).reshape((b,) + (1,) * (x.ndim - 1))
        return jnp.clip(x, -s, s) / s

    def _unet_apply(
        self,
        unet_index: int,
        unet_params,
        x,
        t,
        *,
        cond_scale: float = 1.0,
        video_embed=None,
        text_encodings=None,
        lowres_cond_video=None,
        lowres_noise_level=None,
        self_cond=None,
        video_keep_mask=None,
        text_keep_mask=None,
        negative_video_embed=None,
        negative_text_encodings=None,
    ) -> jnp.ndarray:
        """forward_with_cond_scale as ONE batched forward (reference :683-692
        runs the unet twice). cond_scale is static.

        negative_video_embed / negative_text_encodings (beyond-reference,
        standard negative prompting): under CFG the guidance baseline is
        the NEGATIVE conditioning instead of the learned null embedding —
        guided = neg + (cond - neg) * cond_scale pushes the sample away
        from the negative concept. Broadcastable against the positive
        embed (e.g. (1, d) shared across the batch). Ignored at
        cond_scale == 1 (no guidance stream exists)."""
        unet = self.sample_unets[unet_index]
        out_dtype = x.dtype
        cdt = self.config.sample_compute_dtype
        if cdt is not None:
            cdt = jnp.dtype(cdt)
            # cast params once (loop-invariant: XLA hoists it out of the
            # sampling scan) and the float inputs at the network boundary;
            # the caller's diffusion math stays in out_dtype (f32)
            unet_params = jax.tree_util.tree_map(
                lambda a: a.astype(cdt)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                unet_params,
            )
            castf = (
                lambda a: None if a is None
                else a.astype(cdt)
                if jnp.issubdtype(a.dtype, jnp.floating)
                else a
            )
            x = castf(x)
            video_embed = castf(video_embed)
            text_encodings = castf(text_encodings)
            lowres_cond_video = castf(lowres_cond_video)
            self_cond = castf(self_cond)
            negative_video_embed = castf(negative_video_embed)
            negative_text_encodings = castf(negative_text_encodings)
        kwargs = dict(
            video_embed=video_embed,
            text_encodings=text_encodings,
            lowres_cond_video=lowres_cond_video,
            lowres_noise_level=lowres_noise_level,
            self_cond=self_cond,
        )
        if cond_scale == 1.0:
            return unet.apply(
                unet_params, x, t,
                video_keep_mask=video_keep_mask,
                text_keep_mask=text_keep_mask,
                **kwargs,
            ).astype(out_dtype)
        assert self.can_classifier_guidance, (
            "decoder was not trained with conditional dropout — cannot use "
            "classifier-free guidance (reference assert :1568)"
        )
        b = x.shape[0]
        dup = lambda a: None if a is None else jnp.concatenate([a, a], axis=0)
        keep = jnp.concatenate(
            [jnp.ones((b,), bool), jnp.zeros((b,), bool)], axis=0
        )
        keep_all = jnp.ones((2 * b,), bool)
        # second (guidance-baseline) stream: the learned null embedding
        # (keep=0) by default, or the NEGATIVE conditioning (kept) when one
        # is provided — per modality
        keep_v, keep_t = keep, keep
        emb2 = dict(kwargs)
        if negative_video_embed is not None and kwargs["video_embed"] is not None:
            pos = kwargs["video_embed"]
            neg = jnp.broadcast_to(
                negative_video_embed.astype(pos.dtype), pos.shape
            )
            emb2["video_embed"] = jnp.concatenate([pos, neg], axis=0)
            keep_v = keep_all
        else:
            emb2["video_embed"] = dup(kwargs["video_embed"])
        if (negative_text_encodings is not None
                and kwargs["text_encodings"] is not None):
            pos = kwargs["text_encodings"]
            neg = jnp.broadcast_to(
                negative_text_encodings.astype(pos.dtype), pos.shape
            )
            emb2["text_encodings"] = jnp.concatenate([pos, neg], axis=0)
            keep_t = keep_all
        else:
            emb2["text_encodings"] = dup(kwargs["text_encodings"])
        for key in ("lowres_cond_video", "lowres_noise_level", "self_cond"):
            emb2[key] = dup(kwargs[key])
        out2 = unet.apply(
            dict(unet_params),
            dup(x),
            dup(t),
            video_keep_mask=keep_v,
            text_keep_mask=keep_t,
            **emb2,
        )
        out2 = out2.astype(out_dtype)
        logits, null_logits = out2[:b], out2[b:]
        guided = null_logits + (logits - null_logits) * cond_scale
        phi = self.config.cfg_rescale
        if phi > 0.0:
            c = x.shape[-1]  # prediction channels (rest = learned variance)
            pred_g, rest = guided[..., :c], guided[..., c:]
            pred_c = logits[..., :c]
            axes = tuple(range(1, pred_g.ndim))
            std_c = jnp.std(pred_c, axis=axes, keepdims=True)
            std_g = jnp.std(pred_g, axis=axes, keepdims=True)
            rescaled = pred_g * (std_c / jnp.maximum(std_g, 1e-8))
            pred_out = phi * rescaled + (1.0 - phi) * pred_g
            guided = (
                jnp.concatenate([pred_out, rest], axis=-1)
                if rest.shape[-1] else pred_out
            )
        return guided

    # ------------------------------------------------------------------ #
    # training loss (reference forward :2188-2299 + p_losses :1933-2051)
    # ------------------------------------------------------------------ #
    def loss(
        self,
        params: Dict[str, Any],
        rng: jax.Array,
        video: jnp.ndarray,
        *,
        video_embed: Optional[jnp.ndarray] = None,
        text_encodings: Optional[jnp.ndarray] = None,
        unet_number: int = 1,
        compute_dtype=None,
    ) -> jnp.ndarray:
        """One denoising-loss step for one cascade stage. unet_number is
        1-indexed and STATIC (pick at trace time, reference :2206-2216).
        compute_dtype (e.g. jnp.bfloat16) runs the network in mixed
        precision; diffusion math stays f32."""
        cfg = self.config
        i = unet_number - 1
        ucfg = self.unet_configs[i]
        vae = self.vaes[i]
        sched = self.schedules[i]
        lowres_cfg = self.lowres_configs[i]
        target_size = cfg.frame_sizes[i]
        target_frames = cfg.frame_numbers[i]
        b = video.shape[0]

        assert video.shape[-1] == cfg.channels
        assert video.shape[2] >= target_size and video.shape[3] >= target_size
        # quirk #3 fixed: the reference's training-path assert (:2242) is
        # mis-parenthesized and rejects all text-conditioned training
        assert not (
            self.condition_on_text_encodings and text_encodings is None
        ), "text encodings must be passed in for text-conditioned decoder"
        assert not (
            not self.condition_on_text_encodings and text_encodings is not None
        ), "decoder not conditioned on text, but encodings were given"

        k_t, k_lowres, k_crop, k_loss = jax.random.split(rng, 4)
        times = sched.sample_random_times(k_t, b)

        lowres_cond_video, lowres_noise_level = (None, None)
        if lowres_cfg is not None:
            lowres_cond_video, lowres_noise_level = lowres_condition(
                k_lowres,
                video,
                lowres_cfg,
                target_frame_size=target_size,
                downsample_frame_size=cfg.frame_sizes[i - 1],
                target_frame_number=target_frames,
                downsample_frame_number=cfg.frame_numbers[i - 1],
                noise_schedule=self.lowres_noise_schedule,
            )

        video = resize_video(video, target_size, method="nearest")
        video = resize_video_time(video, target_frames, method="nearest")

        crop = self.random_crop_sizes[i]
        if crop is not None:
            # per-sample offsets shared across the (video, lowres) pair —
            # kornia same-params trick (reference :2260-2265)
            video, lowres_cond_video = paired_random_crop(
                k_crop, video, crop, lowres_cond_video
            )

        vae_params = params.get(f"vae_{i}")
        video = vae.encode(vae_params, video)
        if lowres_cond_video is not None:
            lowres_cond_video = vae.encode(vae_params, lowres_cond_video)

        return self._p_losses(
            i,
            params[f"unet_{i}"],
            k_loss,
            video,
            times,
            video_embed=video_embed,
            text_encodings=text_encodings if ucfg.cond_on_text_encodings else None,
            lowres_cond_video=lowres_cond_video,
            lowres_noise_level=lowres_noise_level,
            is_latent=vae.is_latent,
            compute_dtype=compute_dtype,
        )

    def _p_losses(
        self,
        i: int,
        unet_params,
        rng: jax.Array,
        x_start: jnp.ndarray,
        times: jnp.ndarray,
        *,
        video_embed=None,
        text_encodings=None,
        lowres_cond_video=None,
        lowres_noise_level=None,
        is_latent: bool = False,
        compute_dtype=None,
    ) -> jnp.ndarray:
        cfg = self.config
        ucfg = self.unet_configs[i]
        sched = self.schedules[i]
        learned_var = self.learned_variance[i]
        b = x_start.shape[0]

        k_noise, k_vmask, k_tmask, k_selfcond = jax.random.split(rng, 4)
        noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)

        if not is_latent:
            x_start = self._normalize(x_start)
            if lowres_cond_video is not None:
                lowres_cond_video = self._normalize(lowres_cond_video)

        x_noisy = sched.q_sample(x_start, times, noise)

        video_keep = jax.random.bernoulli(
            k_vmask, 1.0 - cfg.video_cond_drop_prob, (b,)
        )
        text_keep = jax.random.bernoulli(k_tmask, 1.0 - cfg.text_cond_drop_prob, (b,))

        unet = self.unets[i]
        base_kwargs = dict(
            video_embed=video_embed,
            text_encodings=text_encodings,
            lowres_cond_video=lowres_cond_video,
            lowres_noise_level=lowres_noise_level,
        )

        # mixed precision: diffusion math stays f32 above; the network runs
        # in compute_dtype (bf16) with f32 master params cast by the trainer.
        # Cast BEFORE the self-cond block so the extra self-cond forward runs
        # at the same precision as the main one (an uncast f32 lowres cond
        # would silently promote that whole forward to f32).
        x_noisy_in = x_noisy
        if compute_dtype is not None:
            cast = lambda a: None if a is None else a.astype(compute_dtype)
            x_noisy_in = cast(x_noisy)
            base_kwargs = {
                k: (cast(v) if k in ("video_embed", "text_encodings",
                                     "lowres_cond_video") else v)
                for k, v in base_kwargs.items()
            }

        # self-conditioning: 50% of steps condition on a detached x0 estimate
        # (reference :1971-1975); lax.cond pays the extra forward only when
        # the coin lands
        self_cond = None
        if ucfg.self_cond:
            def with_selfcond(_):
                out = unet.apply(
                    unet_params, x_noisy_in, times,
                    video_keep_mask=jnp.ones((b,), bool),
                    text_keep_mask=jnp.ones((b,), bool),
                    **base_kwargs,
                )
                pred, _ = self.parse_unet_output(learned_var, out.astype(jnp.float32))
                return jax.lax.stop_gradient(pred)

            coin = jax.random.bernoulli(k_selfcond, 0.5)
            self_cond = jax.lax.cond(
                coin, with_selfcond, lambda _: jnp.zeros_like(x_noisy), None
            )
            if compute_dtype is not None:
                self_cond = self_cond.astype(compute_dtype)

        unet_output = unet.apply(
            unet_params,
            x_noisy_in,
            times,
            video_keep_mask=video_keep,
            text_keep_mask=text_keep,
            self_cond=self_cond,
            enable_checkpoint=True,
            **base_kwargs,
        )
        unet_output = unet_output.astype(jnp.float32)
        pred, _ = self.parse_unet_output(learned_var, unet_output)

        if self.predict_v[i]:
            target = sched.calculate_v(x_start, times, noise)
        elif self.predict_x_start[i]:
            target = x_start
        else:
            target = noise

        loss = sched.loss_fn(pred, target)
        loss = loss.reshape(b, -1).mean(axis=-1)
        loss = sched.p2_reweigh_loss(loss, times)
        loss = loss.mean()

        if not learned_var:
            return loss

        # Improved-DDPM VLB term with detached mean (reference :2008-2051)
        true_mean, _, true_log_var = sched.q_posterior(x_start, x_noisy, times)
        model_mean, _, model_log_var, _ = self._p_mean_variance(
            i,
            unet_params,
            x_noisy,
            times,
            clip_denoised=False,
            model_output=unet_output,
        )
        detached_mean = jax.lax.stop_gradient(model_mean)
        kl = normal_kl(true_mean, true_log_var, detached_mean, model_log_var)
        kl = kl.reshape(b, -1).mean(axis=-1) * NAT
        decoder_nll = -discretized_gaussian_log_likelihood(
            x_start, means=detached_mean, log_scales=0.5 * model_log_var
        )
        decoder_nll = decoder_nll.reshape(b, -1).mean(axis=-1) * NAT
        vb_losses = jnp.where(times == 0, decoder_nll, kl)
        return loss + vb_losses.mean() * cfg.vb_loss_weight

    def _predict_x_start(self, i: int, x, t, pred):
        """The per-unet epsilon/x0/v parameterization switch (reference
        :1589-1598) — shared by p_mean_variance and every sampling loop."""
        sched = self.schedules[i]
        if self.predict_v[i]:
            return sched.predict_start_from_v(x, t, pred)
        if self.predict_x_start[i]:
            return pred
        return sched.predict_start_from_noise(x, t, pred)

    # ------------------------------------------------------------------ #
    # p(x_{t-1} | x_t) (reference p_mean_variance :1550-1618)
    # ------------------------------------------------------------------ #
    def _p_mean_variance(
        self,
        i: int,
        unet_params,
        x,
        t,
        *,
        clip_denoised: bool = True,
        cond_scale: float = 1.0,
        model_output: Optional[jnp.ndarray] = None,
        x_start_adjust=None,
        **cond_kwargs,
    ):
        sched = self.schedules[i]
        learned_var = self.learned_variance[i]
        if model_output is None:
            model_output = self._unet_apply(
                i, unet_params, x, t, cond_scale=cond_scale, **cond_kwargs
            )
        pred, var_frac_unnorm = self.parse_unet_output(learned_var, model_output)
        x_start = self._predict_x_start(i, x, t, pred)

        if x_start_adjust is not None:
            # hook for guidance terms computed OUTSIDE the posterior math
            # (reconstruction-guided inpainting applies its gradient here,
            # before clipping — see p_sample_loop_ddpm)
            x_start = x_start_adjust(x_start)

        if clip_denoised:
            x_start = self.dynamic_threshold(x_start)

        mean, var, log_var = sched.q_posterior(x_start, x, t)

        if learned_var:
            # network interpolates between beta-max and posterior-min log-var
            # (eq 15, Improved DDPM; reference :1604-1616)
            nd = x.ndim
            from dalle2_video_tpu.diffusion.schedule import _extract

            min_log = _extract(sched.posterior_log_variance_clipped, t, nd)
            max_log = _extract(jnp.log(sched.betas), t, nd)
            frac = (var_frac_unnorm + 1.0) * 0.5  # unnormalize_zero_to_one
            if self.config.learned_variance_constrain_frac:
                frac = jax.nn.sigmoid(frac)
            log_var = frac * max_log + (1.0 - frac) * min_log
            var = jnp.exp(log_var)

        return mean, var, log_var, x_start

    # ------------------------------------------------------------------ #
    # DDPM ancestral sampling loop as lax.scan (reference :1620-1755)
    # ------------------------------------------------------------------ #
    def _inpaint_prep(self, inpaint_video, inpaint_mask, is_latent):
        """Normalize the known video into model space and cast the mask.
        mask: 1 = KNOWN (kept), 0 = generated; broadcastable to the sample."""
        assert inpaint_mask is not None, "inpaint_video requires inpaint_mask"
        x0k = inpaint_video if is_latent else self._normalize(inpaint_video)
        mask = jnp.asarray(inpaint_mask, jnp.float32)
        return x0k, mask

    @staticmethod
    def _inpaint_replace(x_next, x0k, mask, acp_next, k_known, shape):
        """Replacement method (Video Diffusion Models §4 baseline; RePaint
        eq. 8): overwrite the known region with the exact forward marginal
        q(x_t | x0) = sqrt(a-bar) x0 + sqrt(1 - a-bar) eps at the step the
        sampler just produced. At the terminal step a-bar = 1, so the known
        region of the output equals the conditioning video exactly."""
        noise = keyutil.normal(k_known, shape, x_next.dtype)
        known = x0k * jnp.sqrt(acp_next) + jnp.sqrt(1.0 - acp_next) * noise
        return mask * known + (1.0 - mask) * x_next

    def p_sample_loop_ddpm(
        self,
        i: int,
        unet_params,
        rng: jax.Array,
        shape: Tuple[int, ...],
        *,
        cond_scale: float = 1.0,
        is_latent: bool = False,
        inpaint_video: Optional[jnp.ndarray] = None,
        inpaint_mask: Optional[jnp.ndarray] = None,
        inpaint_method: str = "replace",
        inpaint_guidance_weight: float = 10.0,
        **cond_kwargs,
    ) -> jnp.ndarray:
        sched = self.schedules[i]
        ucfg = self.unet_configs[i]
        b = shape[0]

        k_init, k_loop = keyutil.split(rng)
        x_T = keyutil.normal(k_init, shape)

        lowres = cond_kwargs.get("lowres_cond_video")
        if lowres is not None and not is_latent:
            cond_kwargs = dict(cond_kwargs)
            cond_kwargs["lowres_cond_video"] = self._normalize(lowres)

        inpaint = inpaint_video is not None
        if inpaint:
            x0k, mask = self._inpaint_prep(inpaint_video, inpaint_mask, is_latent)
        # acp_pad[k+1] = alpha_bar_k with acp_pad[0] = alpha_bar_{-1} = 1
        acp_pad = jnp.concatenate([jnp.ones((1,)), sched.alphas_cumprod])

        def step(carry, time_scalar):
            x, x_start_prev, key = carry
            key, k_noise, k_known = keyutil.split(key, 3)
            t = jnp.full((b,), time_scalar, jnp.int32)
            self_cond = x_start_prev if ucfg.self_cond else None
            model_output = None
            adjust = None
            if inpaint and inpaint_method == "guided":
                # reconstruction guidance (Video Diffusion Models, Ho et al.
                # 2022, eq. 7): steer the UNKNOWN region's x0 prediction by
                # the gradient of the known-region reconstruction error
                # through the denoiser; weight w_r * sqrt(a-bar_t) / 2
                def recon(xin):
                    out = self._unet_apply(
                        i, unet_params, xin, t, cond_scale=cond_scale,
                        self_cond=self_cond, **cond_kwargs,
                    )
                    pred, _ = self.parse_unet_output(
                        self.learned_variance[i], out)
                    x0 = self._predict_x_start(i, xin, t, pred)
                    return jnp.sum(mask * (x0 - x0k) ** 2), out

                (_, model_output), g = jax.value_and_grad(
                    recon, has_aux=True)(x)
                scale_t = 0.5 * inpaint_guidance_weight * jnp.sqrt(
                    acp_pad[time_scalar + 1])
                adjust = lambda xs: xs - scale_t * g
            mean, _, log_var, x_start = self._p_mean_variance(
                i,
                unet_params,
                x,
                t,
                clip_denoised=self.config.clip_denoised and not is_latent,
                cond_scale=cond_scale,
                model_output=model_output,
                x_start_adjust=adjust,
                self_cond=self_cond,
                **cond_kwargs,
            )
            noise = keyutil.normal(k_noise, x.shape, x.dtype)
            nonzero = (time_scalar > 0).astype(x.dtype)
            x_next = mean + nonzero * jnp.exp(0.5 * log_var) * noise
            if inpaint:
                x_next = self._inpaint_replace(
                    x_next, x0k, mask, acp_pad[time_scalar], k_known, x.shape)
            return (x_next, x_start, key), None

        times = jnp.arange(sched.num_timesteps - 1, -1, -1, dtype=jnp.int32)
        (x, _, _), _ = jax.lax.scan(step, (x_T, jnp.zeros(shape), k_loop), times)
        return self._unnormalize(x) if not is_latent else x

    # ------------------------------------------------------------------ #
    # DDIM sampling (reference :1757-1889; repaired for video — quirk #2)
    # ------------------------------------------------------------------ #
    def p_sample_loop_ddim(
        self,
        i: int,
        unet_params,
        rng: jax.Array,
        shape: Tuple[int, ...],
        *,
        timesteps: int,
        cond_scale: float = 1.0,
        is_latent: bool = False,
        inpaint_video: Optional[jnp.ndarray] = None,
        inpaint_mask: Optional[jnp.ndarray] = None,
        inpaint_method: str = "replace",
        inpaint_guidance_weight: float = 10.0,
        **cond_kwargs,
    ) -> jnp.ndarray:
        sched = self.schedules[i]
        ucfg = self.unet_configs[i]
        eta = self.config.ddim_sampling_eta
        b = shape[0]
        total = sched.num_timesteps

        # static time pair schedule (reference :1780-1785), terminating at
        # t_next = -1 <=> alpha_bar = 1 so the final step returns x0 exactly
        # (proper DDIM; mirrors models/prior.py sample_loop)
        pairs = ddim_time_pairs(total, timesteps)
        t_nows = jnp.array([p[0] for p in pairs], jnp.int32)
        t_nexts = jnp.array([p[1] for p in pairs], jnp.int32)

        k_init, k_loop = keyutil.split(rng)
        x_T = keyutil.normal(k_init, shape)

        lowres = cond_kwargs.get("lowres_cond_video")
        if lowres is not None and not is_latent:
            cond_kwargs = dict(cond_kwargs)
            cond_kwargs["lowres_cond_video"] = self._normalize(lowres)

        # acp_pad[k+1] = alpha_bar_k with acp_pad[0] = alpha_bar_{-1} = 1
        acp_pad = jnp.concatenate([jnp.ones((1,)), sched.alphas_cumprod])
        clip_denoised = self.config.clip_denoised and not is_latent

        inpaint = inpaint_video is not None
        if inpaint:
            x0k, mask = self._inpaint_prep(inpaint_video, inpaint_mask, is_latent)

        def step(carry, tpair):
            x, x_start_prev, key = carry
            t_now, t_next = tpair
            key, k_noise, k_known = keyutil.split(key, 3)
            t = jnp.full((b,), t_now, jnp.int32)
            self_cond = x_start_prev if ucfg.self_cond else None

            def x0_of(xin):
                out = self._unet_apply(
                    i, unet_params, xin, t, cond_scale=cond_scale,
                    self_cond=self_cond, **cond_kwargs,
                )
                pred, _ = self.parse_unet_output(self.learned_variance[i], out)
                return self._predict_x_start(i, xin, t, pred)

            if inpaint and inpaint_method == "guided":
                # reconstruction guidance (VDM eq. 7) — see p_sample_loop_ddpm
                def recon(xin):
                    x0 = x0_of(xin)
                    return jnp.sum(mask * (x0 - x0k) ** 2), x0

                (_, x_start), g = jax.value_and_grad(recon, has_aux=True)(x)
                x_start = x_start - (
                    0.5 * inpaint_guidance_weight * jnp.sqrt(acp_pad[t_now + 1])
                ) * g
            else:
                x_start = x0_of(x)
            if clip_denoised:
                x_start = self.dynamic_threshold(x_start)
            pred_noise = sched.predict_noise_from_start(x, t, x_start)

            alpha = acp_pad[t_now + 1]
            alpha_next = acp_pad[t_next + 1]
            c1 = eta * jnp.sqrt((1 - alpha / alpha_next) * (1 - alpha_next) / (1 - alpha))
            c2 = jnp.sqrt(jnp.maximum((1 - alpha_next) - c1**2, 0.0))
            noise = keyutil.normal(k_noise, x.shape, x.dtype)
            not_last = (t_next >= 0).astype(x.dtype)
            x_next = (
                x_start * jnp.sqrt(alpha_next) + c1 * noise * not_last + c2 * pred_noise
            )
            if inpaint:
                x_next = self._inpaint_replace(
                    x_next, x0k, mask, alpha_next, k_known, x.shape)
            return (x_next, x_start, key), None

        (x, _, _), _ = jax.lax.scan(
            step, (x_T, jnp.zeros(shape), k_loop), (t_nows, t_nexts)
        )
        return self._unnormalize(x) if not is_latent else x

    # ------------------------------------------------------------------ #
    # DPM-Solver++(2M) — beyond reference (which has DDPM only; its DDIM is
    # broken, SURVEY §2e.2). Lu et al. 2022, "DPM-Solver++: Fast Solver for
    # Guided Sampling of Diffusion Probabilistic Models": deterministic
    # second-order multistep in data-prediction space — typically matches
    # DDIM quality at ~4x fewer denoiser calls.
    # ------------------------------------------------------------------ #
    def p_sample_loop_dpmpp(
        self,
        i: int,
        unet_params,
        rng: jax.Array,
        shape: Tuple[int, ...],
        *,
        timesteps: int,
        cond_scale: float = 1.0,
        is_latent: bool = False,
        inpaint_video: Optional[jnp.ndarray] = None,
        inpaint_mask: Optional[jnp.ndarray] = None,
        inpaint_method: str = "replace",
        inpaint_guidance_weight: float = 10.0,
        **cond_kwargs,
    ) -> jnp.ndarray:
        """VP-parameterized 2M update over the same static ddim_time_pairs
        grid. Per step (s -> t), with lam = log(alpha/sigma), h = lam_t -
        lam_s, r = h_prev / h and x0 the model's data prediction:

            D   = (1 + 1/(2r)) * x0_s - (1/(2r)) * x0_prev     (2nd order)
            x_t = (sigma_t/sigma_s) * x_s - alpha_t * expm1(-h) * D

        First step and final step use first order (D = x0_s;
        "lower_order_final"), so the terminal t_next = -1 (alpha_bar = 1)
        returns the data prediction exactly, like the DDIM loop. All
        coefficients are precomputed on host (the grid is static)."""
        sched = self.schedules[i]
        ucfg = self.unet_configs[i]
        b = shape[0]

        pairs = ddim_time_pairs(sched.num_timesteps, timesteps)
        acp = np.concatenate([[1.0], np.asarray(sched.alphas_cumprod)])
        t_now = np.array([p[0] for p in pairs], np.int32)
        t_next = np.array([p[1] for p in pairs], np.int32)
        a_s, s_s = np.sqrt(acp[t_now + 1]), np.sqrt(1.0 - acp[t_now + 1])
        a_t, s_t = np.sqrt(acp[t_next + 1]), np.sqrt(1.0 - acp[t_next + 1])
        with np.errstate(divide="ignore", invalid="ignore"):
            lam_s = np.log(a_s / s_s)
            lam_t = np.log(a_t / s_t)  # +inf at the terminal step
            h = lam_t - lam_s
            r = np.concatenate([[np.nan], h[:-1]]) / h
        first = np.zeros(len(pairs), bool)
        first[0] = True
        first[-1] = True  # lower_order_final
        first |= ~np.isfinite(r)
        coef_x = np.where(np.isfinite(s_t / s_s), s_t / s_s, 0.0)
        coef_d = -a_t * np.expm1(-h)  # h=inf -> a_t (terminal: x = D)
        c2 = np.where(first, 0.0, 1.0 / (2.0 * np.where(first, 1.0, r)))

        k_init, k_loop = keyutil.split(rng)
        x_T = keyutil.normal(k_init, shape)

        lowres = cond_kwargs.get("lowres_cond_video")
        if lowres is not None and not is_latent:
            cond_kwargs = dict(cond_kwargs)
            cond_kwargs["lowres_cond_video"] = self._normalize(lowres)

        clip_denoised = self.config.clip_denoised and not is_latent

        inpaint = inpaint_video is not None
        if inpaint:
            x0k, mask = self._inpaint_prep(inpaint_video, inpaint_mask, is_latent)

        def step(carry, xs):
            x, x0_prev, key = carry
            t_scalar, cx, cd, c2_, acp_now, acp_next = xs
            key, k_known = keyutil.split(key)
            t = jnp.full((b,), t_scalar, jnp.int32)
            self_cond = x0_prev if ucfg.self_cond else None

            def x0_of(xin):
                out = self._unet_apply(
                    i, unet_params, xin, t, cond_scale=cond_scale,
                    self_cond=self_cond, **cond_kwargs,
                )
                pred, _ = self.parse_unet_output(self.learned_variance[i], out)
                return self._predict_x_start(i, xin, t, pred)

            if inpaint and inpaint_method == "guided":
                # reconstruction guidance (VDM eq. 7) — see p_sample_loop_ddpm
                def recon(xin):
                    x0 = x0_of(xin)
                    return jnp.sum(mask * (x0 - x0k) ** 2), x0

                (_, x0), g = jax.value_and_grad(recon, has_aux=True)(x)
                # weight w_r * sqrt(a-bar at the CURRENT level t_now) / 2
                x0 = x0 - (
                    0.5 * inpaint_guidance_weight * jnp.sqrt(acp_now)
                ) * g
            else:
                x0 = x0_of(x)
            if clip_denoised:
                x0 = self.dynamic_threshold(x0)
            d = (1.0 + c2_) * x0 - c2_ * x0_prev
            x_next = cx * x + cd * d
            if inpaint:
                x_next = self._inpaint_replace(
                    x_next, x0k, mask, acp_next, k_known, x.shape)
            return (x_next, x0, key), None

        xs = (
            jnp.asarray(t_now),
            jnp.asarray(coef_x, jnp.float32),
            jnp.asarray(coef_d, jnp.float32),
            jnp.asarray(c2, jnp.float32),
            jnp.asarray(acp[t_now + 1], jnp.float32),   # a-bar at t_now
            jnp.asarray(acp[t_next + 1], jnp.float32),  # a-bar x_next lands on
        )
        (x, _, _), _ = jax.lax.scan(step, (x_T, jnp.zeros(shape), k_loop), xs)
        return self._unnormalize(x) if not is_latent else x

    # ------------------------------------------------------------------ #
    # cascade sampling (reference sample :2053-2186)
    # ------------------------------------------------------------------ #
    def sample_stage(
        self,
        i: int,
        params: Dict[str, Any],
        rng: jax.Array,
        *,
        batch_size: int,
        prev_video: Optional[jnp.ndarray] = None,
        video_embed: Optional[jnp.ndarray] = None,
        text_encodings: Optional[jnp.ndarray] = None,
        cond_scale: float = 1.0,
        inpaint_video: Optional[jnp.ndarray] = None,
        inpaint_mask: Optional[jnp.ndarray] = None,
        inpaint_method: str = "replace",
        inpaint_guidance_weight: float = 10.0,
        negative_video_embed: Optional[jnp.ndarray] = None,
        negative_text_encodings: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Sample one cascade stage. Pure function of (params, rng, conds) —
        jit per stage. Returns video in [0,1], (b, T_i, S_i, S_i, C).

        negative_video_embed / negative_text_encodings: negative-prompt
        guidance — see _unet_apply (CFG baseline becomes the negative
        conditioning; requires cond_scale != 1).

        inpaint_video ([0,1], any (b,T,H,W,C)) + inpaint_mask (1 = known,
        broadcastable over (b,T,H,W,1)) constrain the sample to agree with
        the known region: video extension (mask selects leading frames),
        temporal interpolation (mask selects every k-th frame), or spatial
        inpainting. Both are resized to this stage's geometry; for a latent
        stage the video is VAE-encoded and the mask is pooled to the latent
        grid. Methods: "replace" (VDM §4 baseline / RePaint eq. 8) or
        "guided" (VDM eq. 7 reconstruction guidance). The reference has no
        conditional-generation path (its sample() is unconditional-from-
        noise only, dalle2_video.py:2053-2186) — beyond-reference feature."""
        cfg = self.config
        ucfg = self.unet_configs[i]
        vae = self.vaes[i]
        frame_size = cfg.frame_sizes[i]
        frame_number = cfg.frame_numbers[i]

        k_lowres, k_loop = keyutil.split(rng)

        cond_kwargs: Dict[str, Any] = {}
        if ucfg.cond_on_video_embeds:
            cond_kwargs["video_embed"] = video_embed
            if negative_video_embed is not None:
                cond_kwargs["negative_video_embed"] = negative_video_embed
        if ucfg.cond_on_text_encodings:
            cond_kwargs["text_encodings"] = text_encodings
            if negative_text_encodings is not None:
                cond_kwargs["negative_text_encodings"] = negative_text_encodings

        if ucfg.lowres_cond:
            assert prev_video is not None
            lowres = resize_video(
                prev_video, frame_size, method="nearest", clamp_range=(0.0, 1.0)
            )
            lowres = resize_video_time(lowres, frame_number, method="nearest")
            if self.use_noise_for_lowres[i]:
                level = jnp.full(
                    (batch_size,),
                    int(cfg.lowres_noise_sample_level * 1000),
                    jnp.int32,
                )
                lowres, _ = noise_video(
                    k_lowres, lowres, self.lowres_noise_schedule,
                    self.lowres_configs[i], level,
                )
                cond_kwargs["lowres_noise_level"] = level
            cond_kwargs["lowres_cond_video"] = lowres

        latent_size = vae.get_encoded_fmap_size(frame_size)
        shape = (batch_size, frame_number, latent_size, latent_size, vae.encoded_dim)

        vae_params = params.get(f"vae_{i}")
        if vae.is_latent and cond_kwargs.get("lowres_cond_video") is not None:
            cond_kwargs["lowres_cond_video"] = vae.encode(
                vae_params, cond_kwargs["lowres_cond_video"]
            )

        inpaint_kwargs: Dict[str, Any] = {}
        if inpaint_video is not None:
            assert inpaint_mask is not None, "inpaint_video requires inpaint_mask"
            known = resize_video(
                inpaint_video, frame_size, method="nearest",
                clamp_range=(0.0, 1.0),
            )
            known = resize_video_time(known, frame_number, method="nearest")
            mask = jnp.broadcast_to(
                jnp.asarray(inpaint_mask, jnp.float32),
                inpaint_video.shape[:4] + (1,),
            )
            mask = resize_video(mask, frame_size, method="nearest")
            mask = resize_video_time(mask, frame_number, method="nearest")
            if vae.is_latent:
                # model space is the latent grid: encode the known video and
                # pool the pixel mask down (a latent cell is "known" only if
                # its f x f pixel patch is fully known -> spatial min-pool)
                known = vae.encode(vae_params, known)  # [0,1] in, like loss()
                f = frame_size // latent_size
                assert f * latent_size == frame_size
                mask = jax.lax.reduce_window(
                    mask, jnp.inf, jax.lax.min,
                    (1, 1, f, f, 1), (1, 1, f, f, 1), "VALID",
                )
            inpaint_kwargs = dict(
                # latent `known` is already in model space; pixel `known`
                # is [0,1] and the loop normalizes it (is_latent flag)
                inpaint_video=known,
                inpaint_mask=mask,
                inpaint_method=inpaint_method,
                inpaint_guidance_weight=inpaint_guidance_weight,
            )

        st = self.sample_timesteps[i]
        if st is not None and st < cfg.timesteps:
            few_step = (
                self.p_sample_loop_dpmpp
                if cfg.sampler == "dpmpp" else self.p_sample_loop_ddim
            )
            vid = few_step(
                i, params[f"unet_{i}"], k_loop, shape,
                timesteps=st, cond_scale=cond_scale, is_latent=vae.is_latent,
                **inpaint_kwargs, **cond_kwargs,
            )
        else:
            vid = self.p_sample_loop_ddpm(
                i, params[f"unet_{i}"], k_loop, shape,
                cond_scale=cond_scale, is_latent=vae.is_latent,
                **inpaint_kwargs, **cond_kwargs,
            )
        return vae.decode(vae_params, vid)

    def _jitted_sample_stage(self, i: int, cond_scale: float,
                             inpaint_method: str,
                             inpaint_guidance_weight: float):
        """Compiled sample_stage for stage i. Cache key = everything
        host-side-static the trace reads (the jit itself retraces on
        tensor shape/presence changes). self.sample_timesteps is in the
        key because entry points mutate it around calls (scripts/serve.py
        ddim_steps override)."""
        key = (i, float(cond_scale), str(inpaint_method),
               float(inpaint_guidance_weight), tuple(self.sample_timesteps))
        fn = self._stage_jit_cache.get(key)
        if fn is None:
            def run(params, rng, batch_size, prev_video, video_embed,
                    text_encodings, inpaint_video, inpaint_mask,
                    negative_video_embed, negative_text_encodings):
                return self.sample_stage(
                    i, params, rng, batch_size=batch_size,
                    prev_video=prev_video, video_embed=video_embed,
                    text_encodings=text_encodings, cond_scale=cond_scale,
                    inpaint_video=inpaint_video, inpaint_mask=inpaint_mask,
                    inpaint_method=inpaint_method,
                    inpaint_guidance_weight=inpaint_guidance_weight,
                    negative_video_embed=negative_video_embed,
                    negative_text_encodings=negative_text_encodings,
                )

            fn = jax.jit(run, static_argnums=(2,))
            self._stage_jit_cache[key] = fn
        return fn

    def sample(
        self,
        params: Dict[str, Any],
        rng: jax.Array,
        *,
        video_embed: Optional[jnp.ndarray] = None,
        text_encodings: Optional[jnp.ndarray] = None,
        batch_size: int = 1,
        cond_scale: Union[float, Tuple[float, ...]] = 1.0,
        start_at_unet_number: int = 1,
        stop_at_unet_number: Optional[int] = None,
        video: Optional[jnp.ndarray] = None,
        max_batch_size: Optional[int] = None,
        inpaint_video: Optional[jnp.ndarray] = None,
        inpaint_mask: Optional[jnp.ndarray] = None,
        inpaint_method: str = "replace",
        inpaint_guidance_weight: float = 10.0,
        negative_video_embed: Optional[jnp.ndarray] = None,
        negative_text_encodings: Optional[jnp.ndarray] = None,
        jit_stages: bool = False,
    ) -> jnp.ndarray:
        """Full cascade sampling (host-side loop over jittable stages).

        jit_stages=True compiles and caches ONE PROGRAM PER STAGE
        (_jitted_sample_stage) instead of leaving jitting to the caller —
        use this instead of wrapping the whole cascade in one jax.jit
        when the single fused program would be huge (the axon
        remote-compile service rejects oversized uploads).

        inpaint_video/inpaint_mask enable conditional generation (video
        extension, temporal interpolation, spatial inpainting) — the
        constraint is re-applied at every cascade stage at that stage's
        geometry; see sample_stage.

        negative_video_embed / negative_text_encodings replace the learned
        null embedding as the CFG baseline (negative prompting — see
        _unet_apply); broadcastable (1, ...) negatives are shared across
        the batch (and across max_batch_size chunks).

        `rng` may be a single key (whole-batch noise stream, reference
        semantics) or a batch of per-row keys (see utils/keys.py) — with
        per-row keys, each sample's output is a pure function of its own
        key, invariant to batch composition and chunking.

        max_batch_size chunks the batch to bound peak HBM (reference
        decoder_sample_in_chunks / sample_in_chunks wiring,
        trainer.py:278,308); each chunk reuses the same compiled stages."""
        cfg = self.config
        assert cfg.unconditional or video_embed is not None
        if not cfg.unconditional:
            batch_size = video_embed.shape[0]
        if keyutil.is_batched(rng):
            assert keyutil.batch_size(rng) == batch_size, (
                f"per-row keys ({keyutil.batch_size(rng)}) must match "
                f"batch_size ({batch_size})"
            )

        if max_batch_size is not None and batch_size > max_batch_size:
            from dalle2_video_tpu.utils.chunked import split_batch

            spans = list(split_batch(batch_size, max_batch_size))
            # single key: one fresh key per chunk; per-row keys: each row
            # KEEPS its key (chunking then cannot change any row's output)
            if keyutil.is_batched(rng):
                chunk_keys = [keyutil.take(rng, s, sz) for s, sz in spans]
            else:
                chunk_keys = list(jax.random.split(rng, len(spans)))
            take = lambda a, s, n: None if a is None else a[s : s + n]
            # a broadcastable mask (leading dim 1) is shared across chunks
            take_mask = lambda a, s, n: (
                a if a is None or jnp.ndim(a) == 0 or a.shape[0] == 1
                else a[s : s + n]
            )
            outs = [
                self.sample(
                    params, k,
                    video_embed=take(video_embed, s, sz),
                    text_encodings=take(text_encodings, s, sz),
                    batch_size=sz,
                    cond_scale=cond_scale,
                    start_at_unet_number=start_at_unet_number,
                    stop_at_unet_number=stop_at_unet_number,
                    video=take(video, s, sz),
                    inpaint_video=take(inpaint_video, s, sz),
                    inpaint_mask=take_mask(inpaint_mask, s, sz),
                    inpaint_method=inpaint_method,
                    inpaint_guidance_weight=inpaint_guidance_weight,
                    negative_video_embed=take_mask(negative_video_embed, s, sz),
                    negative_text_encodings=take_mask(
                        negative_text_encodings, s, sz),
                    jit_stages=jit_stages,
                )
                for k, (s, sz) in zip(chunk_keys, spans)
            ]
            return jnp.concatenate(outs, axis=0)
        assert not (self.condition_on_text_encodings and text_encodings is None)
        assert not (not self.condition_on_text_encodings and text_encodings is not None)

        n = cfg.num_unets
        cond_scales = _cast_tuple(cond_scale, n)

        vid = None
        if start_at_unet_number > 1:
            assert video is not None, "video required when starting mid-cascade"
            prev_size = cfg.frame_sizes[start_at_unet_number - 2]
            vid = resize_video(video, prev_size, method="nearest")

        keys = keyutil.split(rng, n)
        for i in range(n):
            if (i + 1) < start_at_unet_number:
                continue
            if jit_stages:
                vid = self._jitted_sample_stage(
                    i, cond_scales[i], inpaint_method, inpaint_guidance_weight
                )(
                    params, keys[i], batch_size, vid, video_embed,
                    text_encodings, inpaint_video, inpaint_mask,
                    negative_video_embed, negative_text_encodings,
                )
            else:
                vid = self.sample_stage(
                    i,
                    params,
                    keys[i],
                    batch_size=batch_size,
                    prev_video=vid,
                    video_embed=video_embed,
                    text_encodings=text_encodings,
                    cond_scale=cond_scales[i],
                    inpaint_video=inpaint_video,
                    inpaint_mask=inpaint_mask,
                    inpaint_method=inpaint_method,
                    inpaint_guidance_weight=inpaint_guidance_weight,
                    negative_video_embed=negative_video_embed,
                    negative_text_encodings=negative_text_encodings,
                )
            if stop_at_unet_number is not None and stop_at_unet_number == i + 1:
                break
        return vid
