"""Progressive (+ guided) distillation of a trained decoder stage.

Beyond the reference (which samples 250-step DDPM with 2x-batched CFG,
`/root/reference/dalle2_video/dalle2_video.py:1620-1755`): distill the
teacher into a student that samples with a FRACTION of the denoiser
evaluations and no CFG duplication, following

  * Salimans & Ho, "Progressive Distillation for Fast Sampling of
    Diffusion Models" (ICLR 2022): the student's one DDIM step matches
    two teacher DDIM steps; repeat, halving the grid.
  * Meng et al., "On Distillation of Guided Diffusion Models" (CVPR
    2023): the teacher is evaluated WITH classifier-free guidance
    (``teacher_cond_scale`` > 1) so the student absorbs guidance into a
    single unguided forward. This implementation uses the fixed-w
    variant (one guidance weight per distilled student) folded into the
    first halving round, rather than w-conditioning the student.

Mechanics (eta=0 DDIM algebra; alpha_t = sqrt(acp_pad[t+1]),
sigma_t = sqrt(1 - acp_pad[t+1]) with acp_pad[0] = alpha_bar_{-1} = 1):

  z_t ~ q(z_t | x0) at a segment start t of the STUDENT grid
  teacher: z_t -> z_mid -> z_end       (two guided DDIM steps)
  target:  x~ = (z_end - (sigma_end/sigma_t) z_t)
               / (alpha_end - (sigma_end/sigma_t) alpha_t)
  loss:    w(t) * || x_hat_student(z_t, t) - x~ ||^2,
           w(t) = max(alpha_t^2/sigma_t^2, 1)   (truncated SNR)

x~ is exactly the x-prediction that makes ONE student DDIM step from z_t
land at z_end (closure property tested in tests/test_distill.py). The
student trains on segments of `ddim_time_pairs(T, student_steps)` — the
same grid `p_sample_loop_ddim(timesteps=student_steps)` samples with, so
the distilled params drop into the existing sampler at cond_scale=1.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax

from dalle2_video_tpu.engine.conditioner import noise_video
from dalle2_video_tpu.engine.decoder import VideoDecoder, ddim_time_pairs
from dalle2_video_tpu.ops.video import resize_video, resize_video_time


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    student_steps: int = 8  # the grid the student will SAMPLE with
    teacher_cond_scale: float = 1.0  # >1 folds CFG into the student
    unet_number: int = 1  # 1-indexed cascade stage (static)
    lr: float = 1e-4
    weight: str = "truncated_snr"  # "truncated_snr" | "none"
    ema_decay: float = 0.999


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DistillState:
    student: Any  # unet_{i} param subtree
    ema: Any  # EMA shadow of student
    opt_state: Any
    step: jnp.ndarray


class DistillTrainer:
    def __init__(self, decoder: VideoDecoder, cfg: DistillConfig = DistillConfig()):
        self.decoder = decoder
        self.cfg = cfg
        i = cfg.unet_number - 1
        self.i = i
        if decoder.unet_configs[i].self_cond:
            raise NotImplementedError(
                "distillation with self-conditioning is not supported — "
                "the teacher two-step would need chained self-cond state"
            )
        # lowres-conditioned SR stages ARE supported: the loss builds the
        # SAMPLING-time conditioning (fixed noise level, no blur) so the
        # distilled student drops into sample()'s cascade unchanged —
        # see _lowres_cond_kwargs.
        if cfg.teacher_cond_scale != 1.0 and not decoder.can_classifier_guidance:
            raise ValueError(
                "teacher_cond_scale > 1 needs a teacher trained with "
                "conditional dropout (cond_drop_prob > 0)"
            )
        self.optimizer = optax.adam(cfg.lr)

        # student grid + teacher midpoints from the doubled grid: the
        # fine grid's even entries must BE the student grid (same linspace
        # reals before the int cast), asserted here rather than trusted
        total = decoder.schedules[i].num_timesteps
        fine = ddim_time_pairs(total, 2 * cfg.student_steps)
        coarse = ddim_time_pairs(total, cfg.student_steps)
        if len(fine) != 2 * len(coarse):
            raise ValueError(
                f"degenerate grid: {2 * cfg.student_steps} teacher steps "
                f"collapse to {len(fine)} — student_steps too large for "
                f"T={total}"
            )
        starts = [f[0] for f in fine[0::2]]
        mids = [f[1] for f in fine[0::2]]
        ends = [f[1] for f in fine[1::2]]
        assert [(s, e) for s, e in zip(starts, ends)] == coarse, (
            "doubled DDIM grid does not refine the student grid"
        )
        self.t_starts = jnp.asarray(starts, jnp.int32)
        self.t_mids = jnp.asarray(mids, jnp.int32)
        self.t_ends = jnp.asarray(ends, jnp.int32)
        sched = decoder.schedules[i]
        self.acp_pad = jnp.concatenate(
            [jnp.ones((1,)), jnp.asarray(sched.alphas_cumprod)]
        )

    # ------------------------------------------------------------------ #
    def init_state(
        self, teacher_params: Dict[str, Any], student_params=None
    ) -> DistillState:
        """Student starts as a copy of the teacher unet (the paper's
        init — the distill loss is then ~0 at teacher_cond_scale=1, since
        DDIM steps with a slowly-varying x-prediction compose) unless an
        explicit ``student_params`` subtree is given."""
        student = jax.tree_util.tree_map(
            jnp.asarray,
            teacher_params[f"unet_{self.i}"]
            if student_params is None else student_params,
        )
        return DistillState(
            student=student,
            ema=jax.tree_util.tree_map(jnp.asarray, student),
            opt_state=self.optimizer.init(student),
            step=jnp.zeros((), jnp.int32),
        )

    def student_decoder_params(
        self, state: DistillState, teacher_params: Dict[str, Any], use_ema: bool = True
    ) -> Dict[str, Any]:
        """Full decoder params with the distilled student swapped in —
        sample via p_sample_loop_ddim(timesteps=cfg.student_steps,
        cond_scale=1.0)."""
        params = dict(teacher_params)
        params[f"unet_{self.i}"] = state.ema if use_ema else state.student
        return params

    # ------------------------------------------------------------------ #
    def _alpha_sigma(self, t: jnp.ndarray, nd: int):
        """alpha/sigma at (possibly -1) timestep t, broadcast to nd dims."""
        acp = self.acp_pad[t + 1].reshape((-1,) + (1,) * (nd - 1))
        return jnp.sqrt(acp), jnp.sqrt(1.0 - acp)

    def _xstart(self, params, z, t, *, cond_scale, cond_kwargs):
        """The x-prediction of one forward, dynamic-thresholded per the
        decoder config for BOTH teacher and student: the sampler will
        threshold the student's prediction too, so training the
        thresholded prediction is the sampling-consistent regression (and
        it preserves the exact-composition-at-init property the tests
        pin). Gradient flows through the quantile rescale."""
        dec, i = self.decoder, self.i
        out = dec._unet_apply(
            i, params, z, t, cond_scale=cond_scale, **cond_kwargs
        )
        pred, _ = dec.parse_unet_output(dec.learned_variance[i], out)
        sched = dec.schedules[i]
        if dec.predict_v[i]:
            x0 = sched.predict_start_from_v(z, t, pred)
        elif dec.predict_x_start[i]:
            x0 = pred
        else:
            x0 = sched.predict_start_from_noise(z, t, pred)
        if dec.config.clip_denoised and not dec.vaes[i].is_latent:
            x0 = dec.dynamic_threshold(x0)
        return x0

    def _ddim_to(self, z, x0, t_from, t_to, nd):
        """One eta=0 DDIM step given the x-prediction (engine/decoder.py
        p_sample_loop_ddim step with c1 = 0)."""
        a_f, s_f = self._alpha_sigma(t_from, nd)
        a_t, s_t = self._alpha_sigma(t_to, nd)
        eps = (z - a_f * x0) / jnp.maximum(s_f, 1e-20)
        return a_t * x0 + s_t * eps

    # ------------------------------------------------------------------ #
    def _lowres_cond_kwargs(
        self, rng: jax.Array, video01: jnp.ndarray, teacher_params
    ) -> Dict[str, Any]:
        """SAMPLING-consistent lowres conditioning for an SR stage: the
        student will be dropped into sample()'s cascade, so the distill
        loss conditions exactly the way engine/decoder.py's sample path
        does (:1148-1174) — simulate the previous stage's output by
        downsampling the [0,1] clip to stage i-1 geometry, resize up to
        this stage, noise at the FIXED ``lowres_noise_sample_level`` (no
        blur, no random level: those are train-time augmentations), VAE-
        encode for latent stages / normalize otherwise."""
        dec, i = self.decoder, self.i
        dcfg = dec.config
        out: Dict[str, Any] = {}
        prev = resize_video(
            video01, dcfg.frame_sizes[i - 1], method="nearest",
            clamp_range=(0.0, 1.0),
        )
        prev = resize_video_time(
            prev, dcfg.frame_numbers[i - 1], method="nearest"
        )
        lowres = resize_video(
            prev, dcfg.frame_sizes[i], method="nearest", clamp_range=(0.0, 1.0)
        )
        lowres = resize_video_time(
            lowres, dcfg.frame_numbers[i], method="nearest"
        )
        if dec.use_noise_for_lowres[i]:
            level = jnp.full(
                (video01.shape[0],),
                int(dcfg.lowres_noise_sample_level * 1000),
                jnp.int32,
            )
            lowres, _ = noise_video(
                rng, lowres, dec.lowres_noise_schedule,
                dec.lowres_configs[i], level,
            )
            out["lowres_noise_level"] = level
        vae = dec.vaes[i]
        if vae.is_latent:
            lowres = vae.encode(teacher_params.get(f"vae_{i}"), lowres)
        else:
            lowres = dec._normalize(lowres)
        out["lowres_cond_video"] = lowres
        return out

    def loss(
        self,
        student_params,
        teacher_params: Dict[str, Any],
        rng: jax.Array,
        video: jnp.ndarray,
        *,
        video_embed=None,
        text_encodings=None,
    ) -> jnp.ndarray:
        dec, i, cfg = self.decoder, self.i, self.cfg
        dcfg = dec.config
        ucfg = dec.unet_configs[i]
        sched = dec.schedules[i]
        b = video.shape[0]

        k_seg, k_noise, k_lowres = jax.random.split(rng, 3)

        lowres_kwargs: Dict[str, Any] = {}
        if ucfg.lowres_cond:
            lowres_kwargs = self._lowres_cond_kwargs(
                k_lowres, video, teacher_params
            )

        video = resize_video(video, dcfg.frame_sizes[i], method="nearest")
        video = resize_video_time(video, dcfg.frame_numbers[i], method="nearest")
        vae = dec.vaes[i]
        video = vae.encode(teacher_params.get(f"vae_{i}"), video)
        if not vae.is_latent:
            video = dec._normalize(video)
        nd = video.ndim
        seg = jax.random.randint(k_seg, (b,), 0, self.t_starts.shape[0])
        t, t_mid, t_end = self.t_starts[seg], self.t_mids[seg], self.t_ends[seg]

        noise = jax.random.normal(k_noise, video.shape, video.dtype)
        z_t = sched.q_sample(video, t, noise)

        cond_kwargs = dict(
            video_embed=video_embed,
            text_encodings=text_encodings if ucfg.cond_on_text_encodings else None,
            **lowres_kwargs,
        )

        # teacher: two guided DDIM steps (no grad path — params are a
        # constant input; stop_gradient documents the intent)
        tp = teacher_params[f"unet_{i}"]
        x0_a = self._xstart(
            tp, z_t, t, cond_scale=cfg.teacher_cond_scale, cond_kwargs=cond_kwargs
        )
        z_mid = self._ddim_to(z_t, x0_a, t, t_mid, nd)
        x0_b = self._xstart(
            tp, z_mid, t_mid, cond_scale=cfg.teacher_cond_scale,
            cond_kwargs=cond_kwargs,
        )
        z_end = self._ddim_to(z_mid, x0_b, t_mid, t_end, nd)

        a_t, s_t = self._alpha_sigma(t, nd)
        a_e, s_e = self._alpha_sigma(t_end, nd)
        ratio = s_e / jnp.maximum(s_t, 1e-20)
        target = jax.lax.stop_gradient(
            (z_end - ratio * z_t) / (a_e - ratio * a_t)
        )

        x0_s = self._xstart(
            student_params, z_t, t, cond_scale=1.0, cond_kwargs=cond_kwargs
        )

        err = jnp.mean(
            jnp.square(x0_s - target), axis=tuple(range(1, nd))
        )
        if cfg.weight == "truncated_snr":
            snr = (a_t * a_t) / jnp.maximum(s_t * s_t, 1e-20)
            err = err * jnp.maximum(snr.reshape(-1), 1.0)
        return jnp.mean(err)

    # ------------------------------------------------------------------ #
    def distill_step(
        self,
        state: DistillState,
        teacher_params: Dict[str, Any],
        rng: jax.Array,
        video: jnp.ndarray,
        *,
        video_embed=None,
        text_encodings=None,
    ):
        """One distillation update; jit with teacher_params captured
        (closed over) or passed as a plain argument — do NOT use
        donate_argnums on this backend (CLAUDE.md: buffer donation crashes
        the axon runtime). Returns (new_state, loss)."""
        loss, grads = jax.value_and_grad(self.loss)(
            state.student, teacher_params, rng, video,
            video_embed=video_embed, text_encodings=text_encodings,
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_state, state.student
        )
        student = optax.apply_updates(state.student, updates)
        d = self.cfg.ema_decay
        ema = jax.tree_util.tree_map(
            lambda e, p: d * e + (1.0 - d) * p, state.ema, student
        )
        return (
            DistillState(
                student=student, ema=ema, opt_state=opt_state,
                step=state.step + 1,
            ),
            loss,
        )
