"""Video-CLIP trainer: ViViT tower + frozen text tower + learned temperature.

Rebuild of reference ``train_clip.py`` training internals (:80-199): frozen
``clip.encode_text`` (here: CLIPTextEncoder params held constant), trainable
ViViT, CLIPLoss with learned temperature (init 5.0, yaml:42), Adam with
cosine or multistep LR schedule (yaml:33-38), top-1/top-10 retrieval
metrics per epoch.

TPU-first: one jitted train step (text embeds computed frozen inside the
step; no_grad == stop_gradient), batch shardable on the data axis with the
sharded global-batch contrastive loss.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from dalle2_video_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from dalle2_video_tpu.models.vivit import ViViT, ViViTConfig
from dalle2_video_tpu.utils.contrastive import clip_loss, retrieval_metrics


def clip_stage_keys(seed: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(k_vivit, k_text, rest) — the ONE key-derivation convention for the
    CLIP stage. train_clip and eval_clip must both use this: the text
    tower is a FROZEN RANDOM network when no OpenAI checkpoint is in-env,
    so an eval that derives it from a different stream of the same seed
    evaluates the video tower against targets it was never trained on
    (round-4 bug: eval_clip used the unsplit root key while train_clip
    used split #2 — full-dataset retrieval scored exactly chance while
    train top1 was 1.0)."""
    k_vivit, k_text, rest = jax.random.split(jax.random.PRNGKey(seed), 3)
    return k_vivit, k_text, rest


@dataclasses.dataclass(frozen=True)
class ClipTrainerConfig:
    lr: float = 1e-3
    lr_scheduler: str = "multistep"  # "cosine" | "multistep" | "constant"
    lr_multistep_milestones: Tuple[float, ...] = (0.4, 0.6, 0.8, 0.9)  # epoch fracs
    lr_step_gamma: float = 0.5
    total_steps: int = 10_000  # for cosine/multistep milestone resolution
    init_temperature: float = 5.0
    weight_decay: float = 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ClipTrainState:
    vivit_params: Any
    temperature: jnp.ndarray  # () learned log-scale
    opt_state: Any
    step: jnp.ndarray


class ClipTrainer:
    def __init__(
        self,
        vivit_config: ViViTConfig,
        text_config: CLIPTextConfig = CLIPTextConfig(),
        cfg: ClipTrainerConfig = ClipTrainerConfig(),
    ):
        self.vivit = ViViT(vivit_config)
        self.text_encoder = CLIPTextEncoder(text_config)
        self.cfg = cfg

        if cfg.lr_scheduler == "cosine":
            # alpha=0.01 mirrors the reference's eta_min = 0.01 * lr
            # (train_clip.py:92-94). Documented divergence: the reference
            # steps CosineAnnealingLR once per EPOCH (T_max=epochs); this
            # schedule anneals per optimizer step over total_steps — same
            # endpoints, smoother path.
            sched = optax.cosine_decay_schedule(cfg.lr, cfg.total_steps,
                                                alpha=0.01)
        elif cfg.lr_scheduler == "multistep":
            boundaries = {
                int(m * cfg.total_steps): cfg.lr_step_gamma
                for m in cfg.lr_multistep_milestones
            }
            sched = optax.piecewise_constant_schedule(cfg.lr, boundaries)
        else:
            sched = optax.constant_schedule(cfg.lr)
        self.schedule = sched
        tx = [optax.scale_by_adam()]
        if cfg.weight_decay > 0:
            # decay the ViViT weights only: the learned temperature is a
            # log-scale loss parameter the reference never decays (its
            # optimizer holds video_encoder.parameters() alone)
            def wd_mask(params):
                return {
                    "vivit": jax.tree_util.tree_map(lambda _: True,
                                                    params["vivit"]),
                    "temp": False,
                }

            tx.append(optax.add_decayed_weights(cfg.weight_decay,
                                                mask=wd_mask))
        tx.append(optax.scale_by_learning_rate(sched))
        self.optimizer = optax.chain(*tx)

    # ------------------------------------------------------------------ #
    def init_state(
        self, rng: jax.Array, sample_video: jnp.ndarray
    ) -> ClipTrainState:
        vp = self.vivit.init(rng, sample_video)
        temp = jnp.asarray(self.cfg.init_temperature, jnp.float32)
        trainable = {"vivit": vp, "temp": temp}
        opt = self.optimizer.init(trainable)
        return ClipTrainState(
            vivit_params=vp, temperature=temp, opt_state=opt,
            step=jnp.zeros((), jnp.int32),
        )

    def init_text_params(self, rng: jax.Array, openai_ckpt: Optional[str] = None):
        if openai_ckpt is not None:
            from dalle2_video_tpu.models.clip_text import load_openai_clip_text_params

            return load_openai_clip_text_params(openai_ckpt)
        return self.text_encoder.init(
            rng, jnp.zeros((1, self.text_encoder.cfg.context_length), jnp.int32)
        )

    # ------------------------------------------------------------------ #
    def embed_text(self, text_params, tokens: jnp.ndarray) -> jnp.ndarray:
        """Frozen text-tower embedding (reference train_clip.py:133-135)."""
        return jax.lax.stop_gradient(
            self.text_encoder.apply(text_params, tokens)
        )

    def embed_video(self, state: ClipTrainState, videos: jnp.ndarray) -> jnp.ndarray:
        return self.vivit.apply(state.vivit_params, videos)

    def _vivit_apply_kwargs(self, rng) -> dict:
        """Dropout plumbing: training applies the tower stochastically when
        dropout is configured (reference model.train() semantics) — an
        explicit rng is then REQUIRED, never silently skipped."""
        has_dropout = self.vivit.cfg.dropout > 0 or self.vivit.cfg.emb_dropout > 0
        if not has_dropout:
            return {}
        if rng is None:
            raise ValueError(
                "ViViT dropout/emb_dropout is configured — pass rng to "
                "train_step so training actually applies it"
            )
        return {"deterministic": False, "rngs": {"dropout": rng}}

    def train_step(
        self,
        state: ClipTrainState,
        text_params: Any,
        videos: jnp.ndarray,
        tokens: jnp.ndarray,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[ClipTrainState, Dict[str, jnp.ndarray]]:
        text_embeds = self.embed_text(text_params, tokens)
        apply_kw = self._vivit_apply_kwargs(rng)

        def loss_fn(trainable):
            video_embeds = self.vivit.apply(trainable["vivit"], videos,
                                            **apply_kw)
            loss = clip_loss(video_embeds, text_embeds, trainable["temp"])
            return loss, video_embeds

        trainable = {"vivit": state.vivit_params, "temp": state.temperature}
        (loss, video_embeds), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable
        )
        updates, new_opt = self.optimizer.update(grads, state.opt_state, trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        metrics = {"loss": loss, "temperature": new_trainable["temp"]}
        metrics.update(retrieval_metrics(video_embeds, text_embeds))
        return (
            ClipTrainState(
                vivit_params=new_trainable["vivit"],
                temperature=new_trainable["temp"],
                opt_state=new_opt,
                step=state.step + 1,
            ),
            metrics,
        )

    def make_sharded_train_step(self, mesh):
        """Data-parallel CLIP step over the mesh with the GLOBAL-batch
        contrastive loss: each shard embeds its videos/texts locally, the
        logit matrix is formed via shard_map all_gather (utils/contrastive.
        sharded_clip_loss), and pjit inserts the gradient psum — the TPU
        equivalent of large-batch CLIP training (SURVEY.md §5)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dalle2_video_tpu.parallel.mesh import DATA_AXIS
        from dalle2_video_tpu.utils.contrastive import sharded_clip_loss

        batch_sh = NamedSharding(mesh, P(DATA_AXIS))
        repl = NamedSharding(mesh, P())

        def step(state, text_params, videos, tokens, rng=None):
            text_embeds = self.embed_text(text_params, tokens)
            apply_kw = self._vivit_apply_kwargs(rng)

            def loss_fn(trainable):
                video_embeds = self.vivit.apply(trainable["vivit"], videos,
                                                **apply_kw)
                loss = sharded_clip_loss(
                    video_embeds, text_embeds, trainable["temp"], mesh
                )
                return loss, video_embeds

            trainable = {"vivit": state.vivit_params, "temp": state.temperature}
            (loss, video_embeds), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(trainable)
            updates, new_opt = self.optimizer.update(grads, state.opt_state, trainable)
            new_trainable = optax.apply_updates(trainable, updates)
            metrics = {"loss": loss, "temperature": new_trainable["temp"]}
            metrics.update(retrieval_metrics(video_embeds, text_embeds))
            return (
                ClipTrainState(
                    vivit_params=new_trainable["vivit"],
                    temperature=new_trainable["temp"],
                    opt_state=new_opt,
                    step=state.step + 1,
                ),
                metrics,
            )

        # pjit's in_shardings must match the CALLED arity: dispatch between
        # the 4-arg (no dropout) and 5-arg (rng replicated) compilations
        jit_plain = jax.jit(
            lambda st, tp, v, t: step(st, tp, v, t),
            in_shardings=(None, repl, batch_sh, batch_sh),
        )
        jit_drop = jax.jit(
            step, in_shardings=(None, repl, batch_sh, batch_sh, repl)
        )

        def dispatch(state, text_params, videos, tokens, rng=None):
            if rng is None:
                return jit_plain(state, text_params, videos, tokens)
            return jit_drop(state, text_params, videos, tokens, rng)

        return dispatch

    def eval_step(
        self, state: ClipTrainState, text_params: Any, videos, tokens
    ) -> Dict[str, jnp.ndarray]:
        text_embeds = self.embed_text(text_params, tokens)
        video_embeds = self.vivit.apply(state.vivit_params, videos)
        loss = clip_loss(video_embeds, text_embeds, state.temperature)
        metrics = {"loss": loss}
        metrics.update(retrieval_metrics(video_embeds, text_embeds))
        return metrics
