"""UNet3D building blocks — TPU-native rewrites of the reference L1 layer.

Reference citations (all /root/reference/dalle2_video/dalle2_video.py unless
noted): Downsample3D :19-26, NearestUpsample3D :29-35, PixelShuffleUpsample3D
:38-78, Block3D :99-133, ResnetBlock3D :136-205, CrossEmbedLayer3D :208-244;
plus the inherited dalle2-pytorch Attention/CrossAttention/LinearAttention/
SinusoidalPosEmb/UpsampleCombiner semantics (SURVEY.md §2b).

TPU-first design choices:
  * layout (B, T, H, W, C): feature dim on lanes
  * every conv in the reference is space-only (1,k,k) — we run it as a 2D
    conv over the folded (B*T) batch, the shape XLA tiles best on the MXU
  * joint t*h*w attention is one batched MQA matmul (Pallas flash kernel is
    wired in ops/pallas once sequence length justifies it)
  * no Python loops over frames anywhere
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dalle2_video_tpu.ops.video import (
    pixel_shuffle_spatial,
    pixel_unshuffle_spatial,
    resize_video,
)

# Matches torch's nn.Linear/nn.Conv default kaiming_uniform(a=sqrt(5)):
# U(+-sqrt(1/fan_in)). (Bias divergence: we use zeros instead of torch's
# U(+-1/sqrt(fan_in)) — documented, training-neutral.)
torch_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def l2norm(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    # eps=1e-12 matches torch F.normalize (dalle2-pytorch's l2norm for
    # cosine-sim attention / embed scaling); utils/contrastive.l2_normalize
    # keeps 1e-8 for the reference CLIPLoss's normalize semantics — the
    # difference is deliberate parity, not drift
    return x / jnp.clip(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class ScaleOnlyLayerNorm(nn.Module):
    """dalle2-pytorch's LayerNorm: learned scale, no bias, eps 1e-5."""

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(use_bias=False, epsilon=1e-5)(x)


class SinusoidalPosEmb(nn.Module):
    """Sinusoidal timestep embedding (inherited SinusoidalPosEmb semantics)."""

    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        half = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
        )
        args = t.astype(jnp.float32)[:, None] * freqs[None, :]
        return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class SpatialConv(nn.Module):
    """Space-only video conv: the reference's (1, k, k) Conv3d, executed as a
    2D conv over the folded (B*T) batch (reference Block3D dalle2_video.py:107:
    'we change each 3x3 convolution into a 1x3x3 convolution')."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = True
    kernel_init: Callable = torch_kernel_init
    # "pallas_small" routes SMALL-SPATIAL 3x3 sites through the pixel-pair-
    # packed Pallas forward (XLA backward) — the geometry where XLA's fwd is
    # halo-dominated (docs/PERF.md: 43.7 vs 21.7 TF/s at 8x8/C=512). Large
    # stages and non-3x3 always use XLA. Param tree is identical.
    impl: str = "xla"  # "xla" | "pallas_small"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from jax.ad_checkpoint import checkpoint_name

        b, t, h, w, c = x.shape
        if (
            self.impl == "pallas_small"
            and self.kernel_size == 3
            and self.stride == 1
            and h * w <= 256
            and w % 2 == 0
            and c % 64 == 0
            and self.features % 64 == 0
        ):
            from dalle2_video_tpu.ops.pallas.spatial_conv import conv3x3_spatial_xbwd

            kernel, bias = _BareConvParams(
                self.features, c, use_bias=self.use_bias,
                kernel_init=self.kernel_init, name="Conv_0",
            )()
            # same dtype promotion as flax nn.Conv
            dts = [x.dtype, kernel.dtype] + ([bias.dtype] if bias is not None else [])
            dt = jnp.result_type(*dts)
            xs = x.reshape(b * t, h, w, c).astype(dt)
            # packed kernel matrix (12C, 2Co) must fit VMEM next to the A
            # blocks: 13 MB bound admits the bf16 512->512 sites; f32 traces
            # (init) and the 1024-in skip-concat sites use the XLA conv with
            # the SAME param tree, so checkpoints interchange across impls
            if 12 * c * 2 * self.features * jnp.dtype(dt).itemsize <= 13 * 1024 * 1024:
                y = conv3x3_spatial_xbwd(
                    xs, kernel.astype(dt),
                    interpret=jax.default_backend() == "cpu",
                )
            else:
                y = jax.lax.conv_general_dilated(
                    xs, kernel.astype(dt), (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
            if bias is not None:
                y = y + bias.astype(dt)
            # named for remat policies (UNet3DConfig.remat_policy="conv"):
            # conv results are the residuals worth saving — their operands
            # are materialized in the forward anyway, so saving them is
            # free; everything between convs can be recomputed fused.
            y = checkpoint_name(y, "conv_out")
            return y.reshape(b, t, h, w, self.features)
        y = x.reshape(b * t, h, w, c)
        y = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="SAME" if self.stride == 1 else [(  # torch-style floor pad
                (self.kernel_size - self.stride) // 2,
                (self.kernel_size - self.stride + 1) // 2,
            )] * 2,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
        )(y)
        y = checkpoint_name(y, "conv_out")  # see pallas path note
        return y.reshape(b, t, y.shape[1], y.shape[2], self.features)


class _GNParams(nn.Module):
    """Bare GroupNorm affine params with flax GroupNorm's names — lets the
    fused Pallas path share a param tree with the XLA path."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


class _BareConvParams(nn.Module):
    """Raw 3x3 conv params with nn.Conv's names/initializers."""

    features: int
    in_features: int
    use_bias: bool = True
    kernel_init: Callable = torch_kernel_init

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", self.kernel_init, (3, 3, self.in_features, self.features)
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class _SpatialConvParams(nn.Module):
    """Param-tree twin of SpatialConv (project/Conv_0/{kernel,bias}) for the
    fused megakernel path — checkpoints interchange with the XLA path."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _BareConvParams(self.features, self.in_features, name="Conv_0")()


class Block3D(nn.Module):
    """conv(1,3,3) -> GroupNorm -> FiLM scale/shift -> SiLU
    (reference Block3D, dalle2_video.py:99-133).

    norm_impl="pallas" streams GN statistics + affine + FiLM + SiLU through
    one fused kernel (ops/pallas/groupnorm_film.py) — avoids flax GN's full
    f32 materialization of bf16 inputs. Param tree identical across impls.
    """

    dim_out: int
    groups: int = 8
    norm_impl: str = "xla"  # "xla" | "pallas"
    conv_impl: str = "xla"  # "xla" | "pallas_small" (see SpatialConv.impl)

    @nn.compact
    def __call__(self, x, scale_shift: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None):
        b, t, h, w, c = x.shape
        fused_ok = (
            self.norm_impl == "fused"
            and w % 2 == 0
            and self.dim_out % self.groups == 0
            # _build_a is Mosaic-safe only for 64-aligned lane slices (same
            # predicate as SpatialConv's pallas_small path) — small-dim unets
            # (e.g. the reference-exact dim-8 SR stage) fall back to XLA
            and c % 64 == 0
            and self.dim_out % 64 == 0
            # packed kernel matrix (12C, 2Co) must fit VMEM (~16 MB/core,
            # measured: 24 MB f32 bmat OOMs at compile). Dtype-aware bound
            # with headroom for blocks/A/scratch: deep f32 traces (init
            # runs f32) and the C>=512 squares fall back to XLA.
            and 12 * c * 2 * self.dim_out * jnp.dtype(x.dtype).itemsize
            <= 8 * 1024 * 1024
        )
        if fused_ok:
            # whole-block Pallas megakernel: conv + bias + GN stats in one
            # pass over the pixel-pair-packed layout, normalize+FiLM+SiLU as
            # a single fused elementwise (ops/pallas/fused_block.py). Param
            # tree identical to the XLA path.
            from dalle2_video_tpu.ops.pallas.fused_block import fused_block3d
            kernel, cbias = _SpatialConvParams(self.dim_out, c, name="project")()
            gamma, beta = _GNParams(self.dim_out, name="norm")()
            if scale_shift is not None:
                scale, shift = scale_shift
            else:
                scale = jnp.zeros((b, self.dim_out), jnp.float32)
                shift = jnp.zeros((b, self.dim_out), jnp.float32)
            return fused_block3d(
                x, kernel, cbias, gamma, beta, scale, shift, self.groups, 1e-5,
                # Mosaic only lowers on TPU; CPU runs (tests' virtual mesh,
                # smoke modes) go through the interpreter — same guard as
                # SpatialConv's pallas_small path
                interpret=jax.default_backend() == "cpu",
            )
        x = SpatialConv(self.dim_out, 3, name="project", impl=self.conv_impl)(x)
        if self.norm_impl == "skip":
            # DIAGNOSTIC ONLY (perf ablation): affine + FiLM + SiLU with no
            # normalization statistics — isolates the GN-stats cost in
            # profiles. Same param tree as the real paths.
            gamma, beta = _GNParams(self.dim_out, name="norm")()
            x = x * gamma.astype(x.dtype) + beta.astype(x.dtype)
            if scale_shift is not None:
                scale, shift = scale_shift
                x = x * (scale[:, None, None, None, :] + 1.0) + shift[:, None, None, None, :]
            return nn.silu(x)
        if self.norm_impl == "pallas":
            from dalle2_video_tpu.ops.pallas.groupnorm_film import (
                groupnorm_film_silu,
            )

            gamma, beta = _GNParams(self.dim_out, name="norm")()
            b, t, h, w, c = x.shape
            if scale_shift is not None:
                scale, shift = scale_shift
            else:
                scale = jnp.zeros((b, c), x.dtype)
                shift = jnp.zeros((b, c), x.dtype)
            y = groupnorm_film_silu(
                x.reshape(b, t * h * w, c), gamma, beta, scale, shift,
                self.groups, 1e-5,
            )
            return y.reshape(b, t, h, w, c).astype(x.dtype)
        # NOTE (r2 perf): three GN variants were A/B'd in the full train step
        # on v5e — flax GN 268.8 ms, fused Pallas fwd+bwd kernel 335.6 ms
        # (kernel boundary breaks fusion), hand-rolled convert-inside-reduce
        # bf16 GN 279.2 ms. flax GN + XLA fusion wins; docs/PERF.md r2.
        # (also tried: nothing_saveable remat of the GN — 290.1 ms, worse;
        # the "f32 residuals" in the profile were free bitcast-remats, not
        # real saves. flax GN as-is remains the fastest variant measured.)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift  # each (b, dim_out)
            x = x * (scale[:, None, None, None, :] + 1.0) + shift[:, None, None, None, :]
        return nn.silu(x)


class CrossAttention(nn.Module):
    """Token cross-attention with learned null kv (inherited CrossAttention
    semantics; used by ResnetBlock3D at reference dalle2_video.py:160-162)."""

    dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    cosine_sim: bool = False
    cosine_sim_scale: float = 16.0
    impl: str = "xla"  # "xla" | "flash" (fused Pallas kernel, fwd-only)

    @nn.compact
    def __call__(self, x, context, mask: Optional[jnp.ndarray] = None):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        inner = h * d

        x_in = ScaleOnlyLayerNorm(name="norm")(x)
        q = nn.Dense(inner, use_bias=False, kernel_init=torch_kernel_init, name="to_q")(x_in)
        kv = nn.Dense(2 * inner, use_bias=False, kernel_init=torch_kernel_init, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        q = q.reshape(b, n, h, d)
        k = k.reshape(b, -1, h, d)
        v = v.reshape(b, -1, h, d)

        # learned null key/value prepended — lets CFG-dropped tokens attend to
        # "nothing" gracefully
        null_kv = self.param("null_kv", nn.initializers.normal(1.0), (2, d))
        nk = jnp.broadcast_to(null_kv[0], (b, 1, h, d))
        nv = jnp.broadcast_to(null_kv[1], (b, 1, h, d))
        k = jnp.concatenate([nk, k], axis=1)
        v = jnp.concatenate([nv, v], axis=1)

        if self.cosine_sim:
            q, k = l2norm(q), l2norm(k)
            scale = self.cosine_sim_scale
        else:
            scale = d**-0.5

        if self.impl == "flash" and mask is None:
            from dalle2_video_tpu.ops.pallas.cross_attention import (
                cross_attention,
            )

            out = cross_attention(q, k, v, sm_scale=scale).reshape(b, n, inner)
        elif self.impl == "broadcast":
            # VPU broadcast-reduce formulation: the context axis is tiny
            # (6-8 cond tokens) so per-head dots are 64-MAC reductions —
            # lowering them as dot_general batches over (b, h) and
            # transposes the BIG (b, n, h, d) q tensor (~2-3 ms/site in the
            # r2 profile); broadcast-multiply + reduce keeps q's layout.
            sim = jnp.sum(q[:, None] * (k * scale)[:, :, None], axis=-1)
            # sim (b, m, n, h)
            if mask is not None:
                m_pad = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
                sim = jnp.where(
                    m_pad[:, :, None, None], sim, jnp.finfo(sim.dtype).min
                )
            attn = jax.nn.softmax(sim, axis=1)
            out = jnp.sum(
                attn[..., None] * v[:, :, None], axis=1
            ).reshape(b, n, inner)
        else:
            # context-major layout: the context axis m is tiny (6-8 cond
            # tokens), so keeping it off the 128-lane minor axis avoids an
            # ~9x padded (b,h,n,m) sim tensor (the B=32 OOM driver —
            # docs/PERF.md #2); n stays minor and tiles perfectly
            sim = jnp.einsum("bnhd,bmhd->bmhn", q * scale, k)
            if mask is not None:
                mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
                sim = jnp.where(
                    mask[:, :, None, None], sim, jnp.finfo(sim.dtype).min
                )
            attn = jax.nn.softmax(sim, axis=1)
            out = jnp.einsum("bmhn,bmhd->bnhd", attn, v).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, kernel_init=torch_kernel_init, name="to_out")(out)
        out = ScaleOnlyLayerNorm(name="out_norm")(out)
        from jax.ad_checkpoint import checkpoint_name

        # named for remat policies ("conv_attn"): saving the attention
        # result avoids replaying the softmax chain in the backward
        return checkpoint_name(out, "attn_out")


def rotary_embed(x: jnp.ndarray, positions: Optional[jnp.ndarray] = None,
                 rot_dim: Optional[int] = None) -> jnp.ndarray:
    """Rotary position embedding on (..., n, d), matching dalle2-pytorch's
    CausalTransformer ``RotaryEmbedding(dim=min(32, dim_head))`` exactly
    (rotary-embedding-torch 'lang' convention): only the first
    ``min(32, d)`` dims are rotated, as interleaved pairs
    (x[2i], x[2i+1]) with inv_freq theta^(-2i/rot_dim), theta 10000;
    remaining dims pass through unrotated."""
    n, d = x.shape[-2], x.shape[-1]
    rd = min(32, d) if rot_dim is None else rot_dim
    half = rd // 2
    inv_freq = 1.0 / (
        10000.0 ** (jnp.arange(0, rd, 2, dtype=jnp.float32) / rd)
    )  # (half,)
    pos = jnp.arange(n, dtype=jnp.float32) if positions is None else positions
    angles = pos[:, None] * inv_freq[None, :]  # (n, half)
    shape = (1,) * (x.ndim - 2) + (n, half)
    cos, sin = jnp.cos(angles).reshape(shape), jnp.sin(angles).reshape(shape)
    xr, x_pass = x[..., :rd].astype(jnp.float32), x[..., rd:]
    x1, x2 = xr[..., 0::2], xr[..., 1::2]  # pair members (..., n, half)
    rot = jnp.stack(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    ).reshape(x.shape[:-1] + (rd,))  # re-interleave pairs
    return jnp.concatenate([rot.astype(x.dtype), x_pass], axis=-1)


class Attention(nn.Module):
    """Self-attention, multi-query (q heads share one kv head) with a learned
    null kv — inherited dalle2-pytorch Attention semantics (SURVEY.md §2b).
    MQA cuts kv HBM traffic ~heads-fold: ideal for the 23k-token joint t*h*w
    bottleneck (reference dalle2_video.py:430-431, 542-558).

    ``rotary`` applies rotary position embedding to q/k of the REAL tokens
    (the learned null kv stays unrotated — it has no position), matching
    dalle2-pytorch CausalTransformer's rotary_emb. ``attn_bias`` (call arg)
    is an additive (heads, n, m) sim bias for T5-style relative positions."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    causal: bool = False
    cosine_sim: bool = False
    cosine_sim_scale: float = 16.0
    rotary: bool = False
    impl: str = "xla"  # "xla" | "flash" (Pallas streaming kernel, custom VJP)

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 attn_bias: Optional[jnp.ndarray] = None):
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        inner = h * d

        x_in = ScaleOnlyLayerNorm(name="norm")(x)
        q = nn.Dense(inner, use_bias=False, kernel_init=torch_kernel_init, name="to_q")(x_in)
        kv = nn.Dense(2 * d, use_bias=False, kernel_init=torch_kernel_init, name="to_kv")(x_in)
        k, v = jnp.split(kv, 2, axis=-1)  # (b, n, d) single kv head

        q = q.reshape(b, n, h, d)
        if self.rotary:
            q = rotary_embed(q.swapaxes(1, 2)).swapaxes(1, 2)
            k = rotary_embed(k)
        null_kv = self.param("null_kv", nn.initializers.normal(1.0), (2, d))
        # same dtype promotion as the concat below (bit-identical non-sp paths)
        ndt = jnp.result_type(null_kv.dtype, k.dtype)
        nk = jnp.broadcast_to(null_kv[0], (b, 1, d)).astype(ndt)
        nv = jnp.broadcast_to(null_kv[1], (b, 1, d)).astype(ndt)

        if self.cosine_sim:
            q, k, nk = l2norm(q), l2norm(k), l2norm(nk)
            scale = self.cosine_sim_scale
        else:
            scale = d**-0.5

        impl = self.impl
        simple = mask is None and not self.causal and attn_bias is None
        if impl == "sp" and simple:
            # sequence-parallel: token axis sharded over the mesh's 'model'
            # axis, flash kernel per shard with gathered kv (VERDICT r2 #5).
            # Falls back to flash/xla when no mesh is active or the token
            # count doesn't divide the axis.
            from dalle2_video_tpu.parallel.mesh import (
                MODEL_AXIS,
                get_active_mesh,
            )

            mesh = get_active_mesh()
            sp_size = mesh.shape.get(MODEL_AXIS, 1) if mesh is not None else 1
            if sp_size > 1 and n % sp_size == 0:
                from dalle2_video_tpu.parallel.sp_attention import (
                    sequence_parallel_mqa,
                )

                out = sequence_parallel_mqa(
                    q, k, v, mesh, sm_scale=scale, null_kv=(nk, nv)
                ).reshape(b, n, inner)
                out = nn.Dense(self.dim, use_bias=False,
                               kernel_init=torch_kernel_init, name="to_out")(out)
                return ScaleOnlyLayerNorm(name="out_norm")(out)
            impl = (
                "flash"
                if n >= 4096 and jax.default_backend() != "cpu"
                else "xla"
            )

        k = jnp.concatenate([nk, k], axis=1)
        v = jnp.concatenate([nv, v], axis=1)

        if impl == "flash" and simple:
            from dalle2_video_tpu.ops.pallas.flash_mqa import mqa_attention

            out = mqa_attention(q, k, v, sm_scale=scale).reshape(b, n, inner)
        else:
            sim = jnp.einsum("bnhd,bmd->bhnm", q * scale, k)
            if attn_bias is not None:
                # bias covers real tokens; null kv column gets zero bias
                sim = sim + jnp.pad(attn_bias, ((0, 0), (0, 0), (1, 0)))[None]
            if mask is not None:
                m = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
                sim = jnp.where(m[:, None, None, :], sim, jnp.finfo(sim.dtype).min)
            if self.causal:
                i = jnp.arange(n)[:, None]
                j = jnp.arange(n + 1)[None, :]
                causal_mask = j <= i + 1  # +1: null kv always visible
                sim = jnp.where(causal_mask[None, None], sim, jnp.finfo(sim.dtype).min)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bhnm,bmd->bnhd", attn, v).reshape(b, n, inner)
        out = nn.Dense(self.dim, use_bias=False, kernel_init=torch_kernel_init, name="to_out")(out)
        out = ScaleOnlyLayerNorm(name="out_norm")(out)
        from jax.ad_checkpoint import checkpoint_name

        # named for remat policies ("conv_attn"): saving the attention
        # result avoids replaying the softmax chain in the backward
        return checkpoint_name(out, "attn_out")


class JointSpaceTimeAttention(nn.Module):
    """RearrangeToSequence(Residual(Attention)) equivalent: flatten all of
    (t, h, w) into one token axis, attend jointly, restore, residual
    (reference dalle2_video.py:430-431 via dalle2-pytorch RearrangeToSequence).
    This is the ONLY temporal mixing in the base Unet3D (SURVEY.md §2e.5)."""

    dim: int
    heads: int = 16
    dim_head: int = 32
    cosine_sim: bool = False
    joint_time: bool = True  # False: per-frame (spatial-only) attention
    # "xla" | "flash" | "auto" | "sp". auto picks by STATIC token count:
    # flash wins the full train step past ~4k joint tokens (probe21: 89.0 vs
    # 97.0 ms at the 90-frame SR stage, 5760 tokens) and is the only
    # compilable option at 23k; below that XLA's fusion wins. Decided at
    # trace time. "sp" = sequence-parallel flash over the active mesh's
    # 'model' axis (Attention handles the fallback when no mesh is active).
    impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        if self.joint_time:
            tokens = x.reshape(b, t * h * w, c)
        else:
            tokens = x.reshape(b * t, h * w, c)
        impl = self.impl
        if impl == "auto":
            # CPU (tests/dryrun) has no compiled Pallas path — stay on XLA
            impl = (
                "flash"
                if tokens.shape[1] >= 4096 and jax.default_backend() != "cpu"
                else "xla"
            )
        out = Attention(
            self.dim,
            heads=self.heads,
            dim_head=self.dim_head,
            cosine_sim=self.cosine_sim,
            impl=impl,
            name="attn",
        )(tokens)
        return x + out.reshape(b, t, h, w, c)


class TemporalAttention(nn.Module):
    """Factorized temporal attention: per-pixel attention over the frame
    axis, residual. The reference lists 'factorized temporal attention' as
    unimplemented future work (reference README.md:82); this provides it for
    temporal-SR cascades. Cheap: sequence length = num_frames."""

    dim: int
    heads: int = 8
    dim_head: int = 32
    cosine_sim: bool = False

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        tokens = jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(b * h * w, t, c)
        out = Attention(
            self.dim, heads=self.heads, dim_head=self.dim_head,
            cosine_sim=self.cosine_sim, name="attn",
        )(tokens)
        out = jnp.transpose(
            out.reshape(b, h, w, t, c), (0, 3, 1, 2, 4)
        )
        return x + out


class LinearAttention(nn.Module):
    """Efficient (linear) attention over each frame's spatial tokens, used for
    the `sparse_attn` stage option. NOTE: in the reference, sparse_attn=True
    would crash (2D-conv LinearAttention fed 5D video — SURVEY.md quirk); we
    implement the evident intent: per-frame linear attention, residual."""

    dim: int
    heads: int = 8
    dim_head: int = 32

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        hd, d = self.heads, self.dim_head
        inner = hd * d
        tokens = x.reshape(b * t, h * w, c)
        tokens_n = ScaleOnlyLayerNorm(name="norm")(tokens)
        qkv = nn.Dense(3 * inner, use_bias=False, kernel_init=torch_kernel_init, name="to_qkv")(tokens_n)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        rs = lambda a: a.reshape(b * t, h * w, hd, d)
        q, k, v = rs(q), rs(k), rs(v)
        q = jax.nn.softmax(q, axis=-1) * (d**-0.5)
        k = jax.nn.softmax(k, axis=1)
        ctx = jnp.einsum("bnhd,bnhe->bhde", k, v)
        out = jnp.einsum("bnhd,bhde->bnhe", q, ctx).reshape(b * t, h * w, inner)
        out = nn.Dense(self.dim, use_bias=False, kernel_init=torch_kernel_init, name="to_out")(out)
        out = ScaleOnlyLayerNorm(name="out_norm")(out)
        return x + out.reshape(b, t, h, w, c)


class ResnetBlock3D(nn.Module):
    """Two Block3Ds + FiLM time conditioning + optional cross-attention over
    flattened (t h w) tokens + residual 1x1 conv
    (reference ResnetBlock3D, dalle2_video.py:136-205)."""

    dim_out: int
    cond_dim: Optional[int] = None
    time_cond_dim: Optional[int] = None
    groups: int = 8
    cosine_sim_cross_attn: bool = False
    norm_impl: str = "xla"
    attn_impl: str = "xla"
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, time_emb=None, cond=None):
        scale_shift = None
        if self.time_cond_dim is not None and time_emb is not None:
            te = nn.silu(time_emb)
            te = nn.Dense(self.dim_out * 2, kernel_init=torch_kernel_init, name="time_mlp")(te)
            scale_shift = jnp.split(te, 2, axis=-1)

        h = Block3D(self.dim_out, groups=self.groups, norm_impl=self.norm_impl,
                    conv_impl=self.conv_impl, name="block1")(x, scale_shift)

        if self.cond_dim is not None:
            assert cond is not None, "cross-attention block requires cond tokens"
            b, t, hh, ww, c = h.shape
            tokens = h.reshape(b, t * hh * ww, c)
            tokens = (
                CrossAttention(
                    self.dim_out,
                    context_dim=self.cond_dim,
                    cosine_sim=self.cosine_sim_cross_attn,
                    impl=self.attn_impl,
                    name="cross_attn",
                )(tokens, cond)
                + tokens
            )
            h = tokens.reshape(b, t, hh, ww, c)

        h = Block3D(self.dim_out, groups=self.groups, norm_impl=self.norm_impl,
                    conv_impl=self.conv_impl, name="block2")(h)

        if x.shape[-1] != self.dim_out:
            x = SpatialConv(self.dim_out, 1, name="res_conv")(x)
        return h + x


class Downsample3D(nn.Module):
    """'SP-conv' downsample (reference dalle2_video.py:19-26: pixel-unshuffle
    + 1x1 conv). Implemented as the mathematically identical 2x2 stride-2
    conv — each output pixel is the same linear map of its 2x2 input patch —
    which avoids the space-to-depth reshapes GSPMD partitions poorly."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        return SpatialConv(self.dim_out, 2, stride=2, name="conv")(x)


class NearestUpsample3D(nn.Module):
    """Nearest 2x spatial upsample + (1,3,3) conv (reference :29-35)."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        x = resize_video(x, h * 2, method="nearest")
        return SpatialConv(self.dim_out, 3, name="conv")(x)


def _icnr_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform draw of (in, out) then 4x tile along subpixels so all
    four subpixels of each output channel are identical at init — the
    checkerboard-free init of reference PixelShuffleUpsample3D (:55-62).
    Kernel layout must match pixel_shuffle_spatial's (c, s1, s2) channel order.
    """
    fan_in, fan_out4 = shape[-2], shape[-1]
    base = torch_kernel_init(key, shape[:-1] + (fan_out4 // 4,), dtype)
    return jnp.repeat(base, 4, axis=-1)  # (in, c*4) with subpixels contiguous


class PixelShuffleUpsample3D(nn.Module):
    """1x1 conv to 4x channels (ICNR init) -> SiLU -> frame-wise pixel shuffle
    (reference PixelShuffleUpsample3D, dalle2_video.py:38-78).

    Executed as ONE 2x2-stride-2 conv_transpose with the shuffle folded into
    the kernel view: the separate depth-to-space produced 7-D relayout
    copies on TPU (~1.5 ms each in the r2 profile, docs/PERF.md). Math is
    IDENTICAL (params: "conv" (C, 4*dim_out) ICNR + "conv_bias"):
    silu and the shuffle permutation commute, and
    kt[s1,s2,ci,co] = W[ci, co*4 + (1-s1)*2 + (1-s2)] reproduces
    pixel_shuffle_spatial's (c, s1, s2) channel order (conv_transpose
    applies flipped taps) — tested against the shuffle formulation."""

    dim_out: int

    @nn.compact
    def __call__(self, x):
        b, t, h, w, c = x.shape
        kernel = self.param("conv", _icnr_init, (c, self.dim_out * 4))
        bias = self.param("conv_bias", nn.initializers.zeros, (self.dim_out * 4,))
        kt = jnp.transpose(
            kernel.reshape(c, self.dim_out, 2, 2), (2, 3, 0, 1)
        )
        kt = jnp.flip(kt, axis=(0, 1)).astype(x.dtype)
        bt = jnp.transpose(
            bias.reshape(self.dim_out, 2, 2), (1, 2, 0)
        ).astype(x.dtype)  # (2, 2, dim_out) per-subpixel bias
        y = jax.lax.conv_transpose(
            x.reshape(b * t, h, w, c), kt, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).reshape(b, t, 2 * h, 2 * w, self.dim_out)
        # bias per output channel varies by subpixel position (s1, s2)
        y = y + jnp.tile(bt[None, None], (1, 1, h, w, 1))
        return nn.silu(y)


class CrossEmbedLayer3D(nn.Module):
    """Multi-scale stem: parallel space-only convs at several kernel sizes,
    channel-split concat; time kernel forced to 1
    (reference CrossEmbedLayer3D, dalle2_video.py:208-244)."""

    dim_out: int
    kernel_sizes: Sequence[int] = (3, 7, 15)
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        assert all((k % 2) == (self.stride % 2) for k in self.kernel_sizes)
        ksizes = sorted(self.kernel_sizes)
        dim_scales = [self.dim_out // (2**i) for i in range(1, len(ksizes))]
        dim_scales = [*dim_scales, self.dim_out - sum(dim_scales)]
        fmaps = [
            SpatialConv(d, k, stride=self.stride, name=f"conv{i}")(x)
            for i, (k, d) in enumerate(zip(ksizes, dim_scales))
        ]
        return jnp.concatenate(fmaps, axis=-1)


class UpsampleCombiner(nn.Module):
    """Optionally combine all upsample-path fmaps at the final resolution
    (inherited UpsampleCombiner; reference usage dalle2_video.py:619-624).
    dim_out = dim + len(fmaps)*dim when enabled, else dim."""

    dim: int
    enabled: bool = False

    @nn.compact
    def __call__(self, x, fmaps: Sequence[jnp.ndarray]):
        if not self.enabled or not fmaps:
            return x
        target = x.shape[2]
        outs = []
        for i, fmap in enumerate(fmaps):
            fmap = resize_video(fmap, target, method="nearest")
            outs.append(Block3D(self.dim, name=f"fmap_block{i}")(fmap))
        return jnp.concatenate([x, *outs], axis=-1)


class TimeConditioning(nn.Module):
    """time -> (time_tokens, time_cond): SinusoidalPosEmb -> Dense+GELU ->
    {token head, cond head} (reference to_time_hiddens/to_time_tokens/
    to_time_cond, dalle2_video.py:348-357)."""

    dim: int
    cond_dim: int
    time_cond_dim: int
    num_time_tokens: int = 2

    @nn.compact
    def __call__(self, time):
        hiddens = SinusoidalPosEmb(self.dim, name="sinu")(time)
        hiddens = nn.Dense(self.time_cond_dim, kernel_init=torch_kernel_init, name="to_hiddens")(hiddens)
        hiddens = nn.gelu(hiddens, approximate=False)
        tokens = nn.Dense(
            self.cond_dim * self.num_time_tokens,
            kernel_init=torch_kernel_init,
            name="to_tokens",
        )(hiddens).reshape(hiddens.shape[0], self.num_time_tokens, self.cond_dim)
        cond = nn.Dense(self.time_cond_dim, kernel_init=torch_kernel_init, name="to_cond")(hiddens)
        return tokens, cond
