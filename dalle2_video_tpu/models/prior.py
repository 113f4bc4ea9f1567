"""Diffusion prior: text embedding -> video embedding.

Rebuild of the inherited ``DiffusionPrior`` + ``DiffusionPriorNetwork``
capability (dalle2-pytorch; reference usage dalle2_video.py:2313,2347-2351
and the "prior" dataset stage, datasets.py:75-79). The reference repo ships
no prior training script — this module provides the full capability:
network, training loss, and best-of-N reranked sampling, plus a trainer
entry point in scripts/train_prior.py.

Network shape (dalle2-pytorch semantics): a causal transformer over the
token sequence [text_encodings, text_embed, time_embed, noised_video_embed,
learned_query]; the prediction is read from the final (learned-query)
position. CFG via learned null embeddings and keep masks, exactly like the
decoder. Best-of-N: sample N candidates per text, keep the one with the
highest cosine similarity to the text embedding (DALL-E 2 paper recipe).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dalle2_video_tpu.diffusion import DiffusionSchedule
from dalle2_video_tpu.models.layers import (
    Attention,
    ScaleOnlyLayerNorm,
    SinusoidalPosEmb,
    torch_kernel_init,
)
from dalle2_video_tpu.utils.contrastive import l2_normalize


class _FF(nn.Module):
    """Feed-forward block. ``swiglu=True`` is the faithful dalle2-pytorch
    FeedForward (swish-GLU gate: Dense(2*inner) -> a * silu(gate));
    ``swiglu=False`` keeps the round-1 GELU variant for checkpoint compat."""

    dim: int
    mult: int = 4
    swiglu: bool = True

    @nn.compact
    def __call__(self, x):
        y = ScaleOnlyLayerNorm(name="norm")(x)
        if self.swiglu:
            y = nn.Dense(self.dim * self.mult * 2, use_bias=False,
                         kernel_init=torch_kernel_init)(y)
            a, gate = jnp.split(y, 2, axis=-1)
            y = a * nn.silu(gate)
        else:
            y = nn.Dense(self.dim * self.mult, use_bias=False,
                         kernel_init=torch_kernel_init)(y)
            y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, use_bias=False, kernel_init=torch_kernel_init)(y)
        return x + y


class RelPosBias(nn.Module):
    """T5-style bucketed relative position bias (dalle2-pytorch
    CausalTransformer.rel_pos_bias semantics): learned (buckets, heads)
    table -> additive (heads, n, n) sim bias, causal bucketing."""

    heads: int
    num_buckets: int = 32
    max_distance: int = 128

    @nn.compact
    def __call__(self, n: int) -> jnp.ndarray:
        table = self.param(
            "table", nn.initializers.normal(0.02), (self.num_buckets, self.heads)
        )
        q_pos = jnp.arange(n)[:, None]
        k_pos = jnp.arange(n)[None, :]
        rel = k_pos - q_pos  # <=0 in the causal region
        # causal bucketing: -rel in [0, inf); half the buckets are exact,
        # the rest log-spaced up to max_distance
        rel = -jnp.clip(rel, max=0)
        exact = self.num_buckets // 2
        is_small = rel < exact
        log_ratio = jnp.log(rel.astype(jnp.float32) / exact + 1e-6) / jnp.log(
            self.max_distance / exact
        )
        large = exact + (log_ratio * (self.num_buckets - exact)).astype(jnp.int32)
        large = jnp.clip(large, max=self.num_buckets - 1)
        buckets = jnp.where(is_small, rel, large)
        return table[buckets].transpose(2, 0, 1)  # (heads, n, n)


class CausalTransformerLayer(nn.Module):
    """One attention + feed-forward layer — the uniform unit CausalTransformer
    scans (``scan_layers=True``) or pipelines (``pipeline_microbatches>0``,
    parallel/pipeline.py). Signature follows nn.scan's (carry, *broadcast)
    contract: returns (x, None). ``ff_experts>0`` swaps the dense FF for a
    top-2 mixture of experts (models/moe.py, expert-parallel over 'model')."""

    dim: int
    heads: int
    dim_head: int
    rotary: bool = True
    swiglu_ff: bool = True
    ff_experts: int = 0
    moe_capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, x, bias):
        x = x + Attention(
            self.dim, heads=self.heads, dim_head=self.dim_head,
            causal=True, rotary=self.rotary, name="attn",
        )(x, attn_bias=bias)
        if self.ff_experts > 0:
            from dalle2_video_tpu.models.moe import MoEFF

            x = MoEFF(
                self.dim, num_experts=self.ff_experts,
                capacity_factor=self.moe_capacity_factor,
                swiglu=self.swiglu_ff, name="ff",
            )(x)
        else:
            x = _FF(self.dim, swiglu=self.swiglu_ff, name="ff")(x)
        return x, None


class CausalTransformer(nn.Module):
    """Pre-norm causal transformer (dalle2-pytorch CausalTransformer shape:
    rotary embedding + T5 rel-pos bias + swish-GLU FF by default).

    ``scan_layers=True`` stores the depth as ONE stacked "layers" subtree
    (every leaf gains a leading (depth,) axis — the nn.scan layout); the
    legacy per-name layout converts losslessly either way via
    parallel/pipeline.py's {stack,unstack}_transformer_params.

    ``pipeline_microbatches > 0`` (requires scan_layers) pipelines the stack
    over the active mesh's 'model' axis — GPipe fill-drain inside one SPMD
    program (parallel/pipeline.py). Mesh discovery follows the house style
    (parallel.mesh.active_mesh, same as sequence-parallel attention); off
    the mesh (or model axis = 1) it falls back to the local scan."""

    dim: int
    depth: int
    heads: int
    dim_head: int
    rotary: bool = True
    rel_pos_bias: bool = True
    swiglu_ff: bool = True
    scan_layers: bool = False
    pipeline_microbatches: int = 0
    ff_experts: int = 0
    moe_capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, x):
        n = x.shape[1]
        bias = RelPosBias(self.heads, name="rel_pos_bias")(n) if self.rel_pos_bias else None
        if self.scan_layers:
            x = self._apply_stacked(x, bias)
        else:
            for i in range(self.depth):
                x = x + Attention(
                    self.dim, heads=self.heads, dim_head=self.dim_head,
                    causal=True, rotary=self.rotary, name=f"attn{i}",
                )(x, attn_bias=bias)
                if self.ff_experts > 0:
                    from dalle2_video_tpu.models.moe import MoEFF

                    x = MoEFF(
                        self.dim, num_experts=self.ff_experts,
                        capacity_factor=self.moe_capacity_factor,
                        swiglu=self.swiglu_ff, name=f"ff{i}",
                    )(x)
                else:
                    x = _FF(self.dim, swiglu=self.swiglu_ff, name=f"ff{i}")(x)
        return nn.LayerNorm(name="final_norm")(x)

    def _apply_stacked(self, x, bias):
        from dalle2_video_tpu.parallel.mesh import MODEL_AXIS, get_active_mesh

        scanned = nn.scan(
            CausalTransformerLayer,
            variable_axes={"params": 0, "losses": 0},
            split_rngs={"params": True},
            length=self.depth,
            in_axes=(nn.broadcast,),
        )(
            self.dim, self.heads, self.dim_head,
            rotary=self.rotary, swiglu_ff=self.swiglu_ff,
            ff_experts=self.ff_experts,
            moe_capacity_factor=self.moe_capacity_factor, name="layers",
        )
        mesh = get_active_mesh()
        use_pipe = (
            self.pipeline_microbatches > 0
            and mesh is not None
            and mesh.shape.get(MODEL_AXIS, 1) > 1
            and not self.is_initializing()
        )
        if not use_pipe:
            x, _ = scanned(x, bias)
            return x
        # pipeline path: read the stacked params this module already owns
        # and stream microbatches through the mesh's model axis
        from dalle2_video_tpu.parallel.pipeline import pipeline_apply

        layer_params = self.variables["params"]["layers"]
        layer = CausalTransformerLayer(
            self.dim, self.heads, self.dim_head,
            rotary=self.rotary, swiglu_ff=self.swiglu_ff,
            ff_experts=self.ff_experts,
            moe_capacity_factor=self.moe_capacity_factor,
        )  # NOTE: MoE aux sow is a no-op on this path (losses not mutable
        # inside the pipeline); MoE and pipelining also both consume the
        # 'model' axis — prefer one per run (models/moe.py docstring)
        if bias is None:
            fn = lambda p, xb: layer.apply({"params": p}, xb, None)[0]
            bcast = ()
        else:
            fn = lambda p, xb, bb: layer.apply({"params": p}, xb, bb)[0]
            bcast = (bias,)
        return pipeline_apply(
            fn, layer_params, x, mesh,
            microbatches=self.pipeline_microbatches,
            axis=MODEL_AXIS, broadcast_args=bcast,
        )


@dataclasses.dataclass(frozen=True)
class PriorNetworkConfig:
    dim: int = 512  # embed dim (= CLIP dim)
    depth: int = 6
    heads: int = 8
    dim_head: int = 64
    max_text_len: int = 77
    cond_on_text_encodings: bool = False
    text_encoding_dim: Optional[int] = None
    self_cond: bool = False
    # dalle2-pytorch CausalTransformer fidelity knobs (ROADMAP #8); all
    # default to the faithful behavior — set False for round-1 checkpoints
    rotary_emb: bool = True
    rel_pos_bias: bool = True
    swiglu_ff: bool = True
    # pipeline parallelism (parallel/pipeline.py): scan_layers stacks the
    # depth into one (depth, ...) params subtree; pipeline_microbatches>0
    # streams that stack over the mesh's 'model' axis as a GPipe pipeline
    scan_layers: bool = False
    pipeline_microbatches: int = 0
    # mixture-of-experts FF (models/moe.py): ff_experts>0 swaps each layer's
    # dense FF for a top-2 MoE; experts shard over 'model' (EP). moe_aux_weight
    # scales the Switch load-balance loss added by DiffusionPrior.loss.
    ff_experts: int = 0
    moe_capacity_factor: float = 2.0
    moe_aux_weight: float = 1e-2


class DiffusionPriorNetwork(nn.Module):
    cfg: PriorNetworkConfig

    @nn.compact
    def __call__(
        self,
        video_embed_noisy: jnp.ndarray,  # (b, dim)
        time: jnp.ndarray,  # (b,)
        *,
        text_embed: jnp.ndarray,  # (b, dim)
        text_encodings: Optional[jnp.ndarray] = None,  # (b, n, enc_dim)
        text_keep_mask: Optional[jnp.ndarray] = None,  # (b,) CFG keep
        self_cond: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b = video_embed_noisy.shape[0]
        d = cfg.dim
        if text_keep_mask is None:
            text_keep_mask = jnp.ones((b,), bool)

        # time token
        t_emb = SinusoidalPosEmb(d, name="time_sinu")(time)
        t_emb = nn.Dense(d, kernel_init=torch_kernel_init, name="time_proj")(t_emb)

        # text embed token with CFG null
        null_text = self.param("null_text_embed", nn.initializers.normal(1.0), (1, d))
        te = jnp.where(text_keep_mask[:, None], text_embed, null_text)

        tokens = []
        if cfg.cond_on_text_encodings:
            # omitting the encoding tokens would change the transformer's
            # sequence length vs training (CFG drops swap in null embeds,
            # never remove the tokens) — require them, don't silently skip
            assert text_encodings is not None, (
                "cond_on_text_encodings=True but no text_encodings passed"
            )
            enc_dim = cfg.text_encoding_dim or d
            enc = nn.Dense(d, kernel_init=torch_kernel_init, name="enc_proj")(text_encodings)
            enc = enc[:, : cfg.max_text_len]
            enc_mask = jnp.any(text_encodings != 0.0, axis=-1)[:, : cfg.max_text_len]
            keep = enc_mask & text_keep_mask[:, None]
            null_enc = self.param(
                "null_text_encodings", nn.initializers.normal(1.0),
                (1, cfg.max_text_len, d),
            )
            enc = jnp.where(keep[:, :, None], enc, null_enc[:, : enc.shape[1]])
            tokens.append(enc)

        x_in = video_embed_noisy
        if cfg.self_cond:
            sc = self_cond if self_cond is not None else jnp.zeros_like(x_in)
            x_in = nn.Dense(d, kernel_init=torch_kernel_init, name="self_cond_proj")(
                jnp.concatenate([x_in, sc], axis=-1)
            )

        learned_query = self.param(
            "learned_query", nn.initializers.normal(1.0), (1, d)
        )
        tokens.extend([
            te[:, None, :],
            t_emb[:, None, :],
            x_in[:, None, :],
            jnp.broadcast_to(learned_query, (b, d))[:, None, :],
        ])
        seq = jnp.concatenate(tokens, axis=1)
        out = CausalTransformer(
            d, cfg.depth, cfg.heads, cfg.dim_head,
            rotary=cfg.rotary_emb, rel_pos_bias=cfg.rel_pos_bias,
            swiglu_ff=cfg.swiglu_ff, scan_layers=cfg.scan_layers,
            pipeline_microbatches=cfg.pipeline_microbatches,
            ff_experts=cfg.ff_experts,
            moe_capacity_factor=cfg.moe_capacity_factor,
            name="transformer",
        )(seq)
        return out[:, -1]  # prediction read from the learned-query position


@dataclasses.dataclass(frozen=True)
class DiffusionPriorConfig:
    network: PriorNetworkConfig = PriorNetworkConfig()
    timesteps: int = 1000
    sample_timesteps: Optional[int] = 64  # DDIM steps at sample time
    beta_schedule: str = "cosine"
    loss_type: str = "l2"
    predict_x_start: bool = True  # DALL-E 2 prior predicts x0
    text_cond_drop_prob: float = 0.1
    video_embed_scale: Optional[float] = None  # image_embed_scale equivalent
    sampling_clamp_l2norm: bool = False
    training_clamp_l2norm: bool = False


def prior_from_config(cfg: Dict[str, Any]) -> "DiffusionPrior":
    """Build the prior from the single-plane YAML config (the `prior:` block
    plus the global `dim`). ONE factory for every consumer — trainer,
    sampler, server — so layout-affecting knobs (scan_layers, ff_experts)
    always match the checkpoint they produced. pipeline_microbatches is
    runtime-only but implies the scan_layers layout."""
    pc = cfg["prior"]
    pipe_mb = int(pc.get("pipeline_microbatches", 0))
    return DiffusionPrior(
        DiffusionPriorConfig(
            network=PriorNetworkConfig(
                dim=cfg["dim"], depth=pc["depth"], heads=pc["heads"],
                dim_head=pc["dim_head"],
                scan_layers=bool(pc.get("scan_layers", False)) or pipe_mb > 0,
                pipeline_microbatches=pipe_mb,
                ff_experts=int(pc.get("ff_experts", 0)),
                moe_capacity_factor=float(pc.get("moe_capacity_factor", 2.0)),
                moe_aux_weight=float(pc.get("moe_aux_weight", 1e-2)),
            ),
            timesteps=pc["timesteps"],
            sample_timesteps=pc["sample_timesteps"],
        )
    )


class DiffusionPrior:
    """Engine: loss + ancestral/DDIM sampling + best-of-N reranking."""

    def __init__(self, config: DiffusionPriorConfig):
        self.config = config
        self.network = DiffusionPriorNetwork(config.network)
        self.schedule = DiffusionSchedule.create(
            config.beta_schedule, config.timesteps, config.loss_type
        )
        # DALL-E 2 scales image embeds by sqrt(dim) during diffusion
        self.embed_scale = (
            config.video_embed_scale
            if config.video_embed_scale is not None
            else config.network.dim**0.5
        )

    def init_params(self, rng: jax.Array) -> Any:
        d = self.config.network.dim
        kwargs = {}
        if self.config.network.cond_on_text_encodings:
            kwargs["text_encodings"] = jnp.zeros(
                (1, 4, self.config.network.text_encoding_dim or d)
            )
        return self.network.init(
            rng,
            jnp.zeros((1, d)),
            jnp.zeros((1,), jnp.int32),
            text_embed=jnp.zeros((1, d)),
            **kwargs,
        )

    # ------------------------------------------------------------------ #
    def loss(
        self,
        params: Any,
        rng: jax.Array,
        video_embed: jnp.ndarray,
        text_embed: jnp.ndarray,
        text_encodings: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        sched = self.schedule
        b = video_embed.shape[0]
        k_t, k_n, k_drop, k_sc = jax.random.split(rng, 4)

        x0 = video_embed * self.embed_scale
        times = sched.sample_random_times(k_t, b)
        noise = jax.random.normal(k_n, x0.shape)
        x_noisy = sched.q_sample(x0, times, noise)
        keep = jax.random.bernoulli(k_drop, 1.0 - cfg.text_cond_drop_prob, (b,))

        self_cond = None
        if cfg.network.self_cond:
            def mk(_):
                pred = self.network.apply(
                    params, x_noisy, times,
                    text_embed=text_embed, text_encodings=text_encodings,
                    text_keep_mask=keep,
                )
                return jax.lax.stop_gradient(pred)

            coin = jax.random.bernoulli(k_sc, 0.5)
            self_cond = jax.lax.cond(coin, mk, lambda _: jnp.zeros_like(x0), None)

        aux = 0.0
        if cfg.network.ff_experts > 0 and cfg.network.moe_aux_weight > 0:
            # collect the MoE load-balance loss sown by each layer
            # (models/moe.py; mean over layers, Switch Transformer eq. 4)
            pred, sown = self.network.apply(
                params, x_noisy, times,
                text_embed=text_embed, text_encodings=text_encodings,
                text_keep_mask=keep, self_cond=self_cond,
                mutable=["losses"],
            )
            leaves = jax.tree_util.tree_leaves(sown["losses"])
            aux = cfg.network.moe_aux_weight * jnp.mean(
                jnp.stack([jnp.mean(l) for l in leaves])
            )
        else:
            pred = self.network.apply(
                params, x_noisy, times,
                text_embed=text_embed, text_encodings=text_encodings,
                text_keep_mask=keep, self_cond=self_cond,
            )
        if cfg.training_clamp_l2norm:
            pred = l2_normalize(pred) * self.embed_scale

        target = x0 if cfg.predict_x_start else noise
        return jnp.mean(sched.loss_fn(pred, target)) + aux

    # ------------------------------------------------------------------ #
    def _pred_x0(self, params, x, t, cond_scale, text_embed, text_encodings, self_cond):
        cfg = self.config
        b = x.shape[0]

        def fwd(keep):
            return self.network.apply(
                params, x if keep.shape[0] == b else jnp.concatenate([x, x]),
                t if keep.shape[0] == b else jnp.concatenate([t, t]),
                text_embed=text_embed if keep.shape[0] == b else jnp.concatenate([text_embed] * 2),
                text_encodings=text_encodings if (text_encodings is None or keep.shape[0] == b)
                else jnp.concatenate([text_encodings] * 2),
                text_keep_mask=keep,
                self_cond=self_cond if (self_cond is None or keep.shape[0] == b)
                else jnp.concatenate([self_cond] * 2),
            )

        if cond_scale == 1.0:
            pred = fwd(jnp.ones((b,), bool))
        else:
            keep = jnp.concatenate([jnp.ones((b,), bool), jnp.zeros((b,), bool)])
            out2 = fwd(keep)
            pred = out2[b:] + (out2[:b] - out2[b:]) * cond_scale

        sched = self.schedule
        if cfg.predict_x_start:
            x0 = pred
        else:
            x0 = sched.predict_start_from_noise(x, t, pred)
        if cfg.sampling_clamp_l2norm:
            x0 = l2_normalize(x0) * self.embed_scale
        return x0

    def sample_loop(
        self,
        params: Any,
        rng: jax.Array,
        text_embed: jnp.ndarray,
        text_encodings: Optional[jnp.ndarray] = None,
        cond_scale: float = 1.0,
    ) -> jnp.ndarray:
        """Deterministic DDIM (eta=0) loop in embed space; `sample_timesteps`
        selects the step count (defaults to the full T, still eta=0 — the
        reference's DiffusionPrior exposes no eta knob either)."""
        cfg = self.config
        sched = self.schedule
        b, d = text_embed.shape
        from dalle2_video_tpu.utils import keys as keyutil

        k_init, _ = keyutil.split(rng)
        x = keyutil.normal(k_init, (b, d))

        steps = cfg.sample_timesteps or sched.num_timesteps
        import numpy as np

        times = np.linspace(-1, sched.num_timesteps - 1, steps + 1).astype(int)[::-1]
        pairs = list(zip(times[:-1], times[1:]))
        t_now = jnp.array([p[0] for p in pairs], jnp.int32)
        t_next = jnp.array([p[1] for p in pairs], jnp.int32)
        acp = jnp.concatenate([jnp.ones((1,)), sched.alphas_cumprod])  # acp[-1]=1 at idx 0

        def step(carry, tp):
            x, x0_prev = carry
            tn, tnx = tp
            tvec = jnp.full((b,), tn, jnp.int32)
            sc = x0_prev if cfg.network.self_cond else None
            x0 = self._pred_x0(
                params, x, tvec, cond_scale, text_embed, text_encodings, sc
            )
            eps = sched.predict_noise_from_start(x, tvec, x0)
            a_next = acp[tnx + 1]
            # eta=0 DDIM step in embed space; terminal tnx=-1 hits acp[0]=1
            # so the loop returns x0 exactly
            x_next = x0 * jnp.sqrt(a_next) + jnp.sqrt(1.0 - a_next) * eps
            return (x_next, x0), None

        (x, _), _ = jax.lax.scan(
            step, (x, jnp.zeros_like(x)), (t_now, t_next)
        )
        return x / self.embed_scale

    def sample(
        self,
        params: Any,
        rng: jax.Array,
        text_embed: jnp.ndarray,
        text_encodings: Optional[jnp.ndarray] = None,
        num_samples_per_batch: int = 2,
        cond_scale: float = 1.0,
    ) -> jnp.ndarray:
        """Best-of-N sampling with cosine-similarity reranking against the
        text embed (DiffusionPrior.sample semantics; reference usage
        dalle2_video.py:2347-2351).

        `rng` may be a single key or per-row keys (utils/keys.py): with
        per-row keys, candidate j of row i draws from fold_in(key_i, j),
        so each row's result depends only on its own key."""
        from dalle2_video_tpu.utils import keys as keyutil

        n = num_samples_per_batch
        b, d = text_embed.shape
        rep = jnp.repeat(text_embed, n, axis=0)
        rep_enc = (
            jnp.repeat(text_encodings, n, axis=0) if text_encodings is not None else None
        )
        if keyutil.is_batched(rng):
            rep_rng = jax.vmap(
                lambda k: jnp.stack(
                    [jax.random.fold_in(k, j) for j in range(n)]
                )
            )(rng)  # (b, n, …) candidate keys
            rep_rng = rep_rng.reshape((b * n,) + rep_rng.shape[2:])
        else:
            rep_rng = rng
        embeds = self.sample_loop(params, rep_rng, rep, rep_enc, cond_scale)
        embeds = embeds.reshape(b, n, d)
        text_n = l2_normalize(text_embed)
        cand_n = l2_normalize(embeds, axis=-1)
        sims = jnp.einsum("bd,bnd->bn", text_n, cand_n)
        best = jnp.argmax(sims, axis=-1)
        return jnp.take_along_axis(embeds, best[:, None, None], axis=1).squeeze(1)
