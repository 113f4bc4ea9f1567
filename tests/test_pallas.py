"""Pallas kernel numerics tests (interpret mode on the CPU harness;
compiled path exercised on real TPU by bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.ops.pallas.flash_mqa import flash_mqa, mqa_attention


def xla_mqa(q, k, v, scale):
    """Reference: models.layers.Attention einsum semantics."""
    sim = jnp.einsum("bnhd,bmd->bhnm", q * scale, k)
    attn = jax.nn.softmax(sim, axis=-1)
    return jnp.einsum("bhnm,bmd->bnhd", attn, v)


@pytest.mark.parametrize("n,m", [(128, 128), (200, 130), (64, 513)])
def test_flash_mqa_matches_xla(n, m):
    d = 32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (2, n, d))
    k = jax.random.normal(kk, (2, m, d))
    v = jax.random.normal(kv, (2, m, d))
    scale = d**-0.5
    expected = jax.nn.softmax((q * scale) @ jnp.swapaxes(k, 1, 2), axis=-1) @ v
    got = flash_mqa(q, k, v, sm_scale=scale, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


@pytest.mark.parametrize("n,m,inner", [(128, 256, 2), (96, 200, 2), (64, 130, 4)])
def test_flash_mqa_inner_kv_matches_xla(n, m, inner):
    """inner_kv > 1 (grid-cell kv amortization, roadmap item 2): the
    unrolled sub-tile online softmax is exact vs XLA, including when kv
    padding lands inside the LAST sub-tile of the DMA block (m=200 with
    block_k=64, inner=2 pads 200->256: final sub-tile half-padded; m=130
    with inner=4 pads to 256: entire trailing sub-tiles padded)."""
    d = 32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(7), 3)
    q = jax.random.normal(kq, (2, n, d))
    k = jax.random.normal(kk, (2, m, d))
    v = jax.random.normal(kv, (2, m, d))
    scale = d**-0.5
    expected = jax.nn.softmax((q * scale) @ jnp.swapaxes(k, 1, 2), axis=-1) @ v
    got = flash_mqa(q, k, v, sm_scale=scale, block_q=64, block_k=64,
                    interpret=True, inner_kv=inner)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_flash_mqa_inner_kv_gradients():
    """inner_kv forward composes with BOTH backwards (the saved lse from the
    inner-kv forward must be bit-consistent with what the Pallas backward
    kernels recompute at their own blocks)."""
    d, n, m = 32, 96, 200
    kq, kk, kv, kg = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(kq, (2, n, d))
    k = jax.random.normal(kk, (2, m, d))
    v = jax.random.normal(kv, (2, m, d))
    g = jax.random.normal(kg, (2, n, d))
    scale = d**-0.5

    def ref(q, k, v):
        return jax.nn.softmax((q * scale) @ jnp.swapaxes(k, 1, 2), axis=-1) @ v

    want = jax.vjp(ref, q, k, v)[1](g)
    for bwd in ("pallas", "xla_scan"):
        fn = lambda q, k, v: flash_mqa(
            q, k, v, sm_scale=scale, block_q=64, block_k=64, interpret=True,
            bwd_impl=bwd, bwd_block_q=64, bwd_block_k=64, inner_kv=2)
        got = jax.vjp(fn, q, k, v)[1](g)
        for w, gg in zip(want, got):
            np.testing.assert_allclose(np.asarray(gg), np.asarray(w), atol=3e-5)


def test_flash_mqa_exp2_matches_exp():
    """Base-2 online softmax (use_exp2: log2(e) folded into the q prescale,
    exp2 inside the kernel) is exact — output AND the natural-domain lse the
    backward kernels consume (probe10)."""
    from dalle2_video_tpu.ops.pallas.flash_mqa import _flash_mqa_fwd_only

    d = 32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (2, 200, d))
    k = jax.random.normal(kk, (2, 130, d))
    v = jax.random.normal(kv, (2, 130, d))
    scale = d**-0.5
    s = jnp.einsum("bnd,bmd->bnm", q, k) * scale
    expected = jax.nn.softmax(s, axis=-1) @ v
    lse_ref = jax.scipy.special.logsumexp(s, axis=-1)
    got, lse = _flash_mqa_fwd_only(
        q, k, v, sm_scale=scale, block_q=64, block_k=64, interpret=True,
        save_lse=True, use_exp2=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(lse[..., 0]), np.asarray(lse_ref), atol=2e-5
    )


def test_mqa_attention_heads_fold():
    b, n, h, d, m = 2, 40, 4, 16, 50
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(keys[0], (b, n, h, d))
    k = jax.random.normal(keys[1], (b, m, d))
    v = jax.random.normal(keys[2], (b, m, d))
    scale = d**-0.5
    expected = xla_mqa(q, k, v, scale)
    got = mqa_attention(q, k, v, sm_scale=scale, block_q=32, block_k=32,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_flash_mqa_extreme_values_stable():
    """Online softmax must survive large logits (no inf/nan)."""
    d = 16
    q = jnp.full((1, 32, d), 30.0)
    k = jnp.full((1, 32, d), 30.0)
    v = jnp.ones((1, 32, d))
    out = flash_mqa(q, k, v, sm_scale=1.0, block_q=32, block_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)


class TestGroupNormFilmSilu:
    def _oracle(self, x, gamma, beta, scale, shift, groups=4, eps=1e-5):
        from dalle2_video_tpu.ops.pallas.groupnorm_film import _reference_math

        return _reference_math(x, gamma, beta, scale, shift, groups, eps)

    def test_matches_reference(self):
        from dalle2_video_tpu.ops.pallas.groupnorm_film import groupnorm_film_silu

        b, l, c, g = 2, 200, 16, 4
        keys = jax.random.split(jax.random.PRNGKey(0), 5)
        x = jax.random.normal(keys[0], (b, l, c))
        gamma = jax.random.normal(keys[1], (c,)) * 0.1 + 1.0
        beta = jax.random.normal(keys[2], (c,)) * 0.1
        scale = jax.random.normal(keys[3], (b, c)) * 0.1
        shift = jax.random.normal(keys[4], (b, c)) * 0.1
        got = groupnorm_film_silu(x, gamma, beta, scale, shift, g, 1e-5, 64, True)
        want = self._oracle(x, gamma, beta, scale, shift, g)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def test_matches_flax_groupnorm(self):
        """Cross-check the oracle itself against flax GroupNorm."""
        from flax import linen as nn

        b, l, c, g = 1, 64, 8, 2
        x = jax.random.normal(jax.random.PRNGKey(1), (b, l, c))
        gn = nn.GroupNorm(num_groups=g, epsilon=1e-5)
        params = gn.init(jax.random.PRNGKey(2), x)
        flax_out = gn.apply(params, x)
        want = jax.nn.silu(flax_out)  # gamma=1 beta=0 scale=0 shift=0
        got = self._oracle(
            x, jnp.ones((c,)), jnp.zeros((c,)), jnp.zeros((b, c)),
            jnp.zeros((b, c)), groups=g,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    def test_gradients(self):
        from dalle2_video_tpu.ops.pallas.groupnorm_film import groupnorm_film_silu

        b, l, c, g = 1, 48, 8, 2
        keys = jax.random.split(jax.random.PRNGKey(3), 5)
        x = jax.random.normal(keys[0], (b, l, c))
        gamma = jnp.ones((c,))
        beta = jnp.zeros((c,))
        scale = jax.random.normal(keys[3], (b, c)) * 0.1
        shift = jnp.zeros((b, c))

        def loss_kernel(x_, gamma_, scale_):
            return jnp.sum(
                groupnorm_film_silu(x_, gamma_, beta, scale_, shift, g, 1e-5, 32, True) ** 2
            )

        def loss_oracle(x_, gamma_, scale_):
            return jnp.sum(self._oracle(x_, gamma_, beta, scale_, shift, g) ** 2)

        gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, gamma, scale)
        go = jax.grad(loss_oracle, argnums=(0, 1, 2))(x, gamma, scale)
        for a, b_ in zip(gk, go):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5)

    def test_unaligned_length_masked(self):
        """Tail padding must not pollute the statistics."""
        from dalle2_video_tpu.ops.pallas.groupnorm_film import groupnorm_film_silu

        b, l, c, g = 1, 50, 8, 2  # 50 % 32 != 0
        x = jax.random.normal(jax.random.PRNGKey(4), (b, l, c))
        out = groupnorm_film_silu(
            x, jnp.ones((c,)), jnp.zeros((c,)), jnp.zeros((b, c)),
            jnp.zeros((b, c)), g, 1e-5, 32, True,
        )
        want = self._oracle(
            x, jnp.ones((c,)), jnp.zeros((c,)), jnp.zeros((b, c)),
            jnp.zeros((b, c)), groups=g,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_block3d_pallas_matches_xla():
    """Block3D with norm_impl='pallas' must match the XLA path on the SAME
    params (shared param tree). Pallas runs in interpret mode on the CPU
    harness (patched); compiled path is exercised on real TPU by bench."""
    import unittest.mock as mock

    from dalle2_video_tpu.models.layers import Block3D
    from dalle2_video_tpu.ops.pallas import groupnorm_film

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 8, 8, 8))
    ss = (
        jax.random.normal(jax.random.PRNGKey(1), (2, 16)) * 0.1,
        jax.random.normal(jax.random.PRNGKey(2), (2, 16)) * 0.1,
    )
    xla_block = Block3D(16, groups=4, norm_impl="xla")
    pl_block = Block3D(16, groups=4, norm_impl="pallas")
    params = xla_block.init(jax.random.PRNGKey(3), x, ss)
    out_xla = xla_block.apply(params, x, ss)

    orig = groupnorm_film._fwd_impl
    with mock.patch.object(
        groupnorm_film, "_fwd_impl",
        lambda x_, g_, b_, s_, sh_, gr, e, bl, it: orig(
            x_, g_, b_, s_, sh_, gr, e, bl, True
        ),
    ):
        out_pl = pl_block.apply(params, x, ss)
    np.testing.assert_allclose(np.asarray(out_pl), np.asarray(out_xla), atol=3e-5)


def test_fused_cross_attention_matches_xla():
    from dalle2_video_tpu.ops.pallas.cross_attention import cross_attention

    b, n, h, d, m = 2, 100, 4, 16, 7
    keys = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(keys[0], (b, n, h, d))
    k = jax.random.normal(keys[1], (b, m, h, d))
    v = jax.random.normal(keys[2], (b, m, h, d))
    scale = d**-0.5
    sim = jnp.einsum("bnhd,bmhd->bhnm", q * scale, k)
    expected = jnp.einsum("bhnm,bmhd->bnhd", jax.nn.softmax(sim, -1), v)
    got = cross_attention(q, k, v, sm_scale=scale, block_n=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_cross_attention_module_flash_matches_xla():
    """CrossAttention(impl='flash') == impl='xla' on the same params."""
    import unittest.mock as mock

    from dalle2_video_tpu.models.layers import CrossAttention
    from dalle2_video_tpu.ops.pallas import cross_attention as ca_mod

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 60, 24))
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16))
    m_x = CrossAttention(24, context_dim=16, heads=2, dim_head=8, impl="xla")
    m_f = CrossAttention(24, context_dim=16, heads=2, dim_head=8, impl="flash")
    params = m_x.init(jax.random.PRNGKey(2), x, ctx)
    out_x = m_x.apply(params, x, ctx)
    orig = ca_mod.fused_cross_attention
    with mock.patch.object(
        ca_mod, "fused_cross_attention",
        lambda q, k, v, sm_scale, block_n=1024, interpret=False: orig(
            q, k, v, sm_scale=sm_scale, block_n=block_n, interpret=True
        ),
    ):
        out_f = m_f.apply(params, x, ctx)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), atol=3e-5)


@pytest.mark.parametrize("bwd_impl", ["pallas", "xla_scan"])
def test_flash_mqa_gradients_match_xla(bwd_impl):
    """Flash backward (Pallas streaming kernels / r2 blockwise XLA scan) ==
    autodiff through XLA attention."""
    b, n, m, d = 2, 70, 50, 16  # unaligned sizes exercise padding/masking
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(keys[0], (b, n, d))
    k = jax.random.normal(keys[1], (b, m, d))
    v = jax.random.normal(keys[2], (b, m, d))
    scale = d**-0.5

    def loss_flash(q_, k_, v_):
        out = flash_mqa(q_, k_, v_, sm_scale=scale, block_q=32, block_k=32,
                        interpret=True, bwd_impl=bwd_impl)
        return jnp.sum(out**2)

    def loss_xla(q_, k_, v_):
        sim = jnp.einsum("bnd,bmd->bnm", q_ * scale, k_)
        out = jax.nn.softmax(sim, -1) @ v_
        return jnp.sum(out**2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_mqa_pallas_bwd_negative_logits_unaligned():
    """Unaligned kv + strongly negative real logits: the padded columns'
    unmasked p = exp(0 - lse) would overflow in the bwd kernels (inf * 0 ->
    NaN against the zero k rows); the kvmask multiply must keep gradients
    finite and exact."""
    d = 16
    q = jnp.full((1, 8, d), 2.0)
    k = -jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (1, 37, d))) - 1.0
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 37, d))
    scale = d**-0.5

    def loss_flash(q_, k_, v_):
        out = flash_mqa(q_, k_, v_, sm_scale=scale, block_q=32, block_k=32,
                        interpret=True, bwd_impl="pallas")
        return jnp.sum(out**2)

    def loss_xla(q_, k_, v_):
        sim = jnp.einsum("bnd,bmd->bnm", q_ * scale, k_)
        return jnp.sum((jax.nn.softmax(sim, -1) @ v_) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        assert bool(jnp.isfinite(a).all())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


def test_flash_mqa_pallas_bwd_lse_overflow_regime():
    """lse < -87: a padded column's unmasked p = exp(0 - lse) overflows f32
    (inf * 0 -> NaN under a post-exp mask multiply). The bwd kernels mask
    INSIDE the exponent, so gradients must stay finite and match XLA even
    when every real logit is below the f32 exp-overflow threshold."""
    d = 16
    q = jnp.full((1, 8, d), 16.0)
    # s = q.k * scale ~= -128 per column -> lse ~= -124, exp(-lse) = inf
    k = jnp.full((1, 37, d), -2.0) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (1, 37, d))
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 37, d))
    scale = d**-0.5

    def loss_flash(q_, k_, v_):
        out = flash_mqa(q_, k_, v_, sm_scale=scale, block_q=32, block_k=32,
                        interpret=True, bwd_impl="pallas")
        return jnp.sum(out**2)

    def loss_xla(q_, k_, v_):
        sim = jnp.einsum("bnd,bmd->bnm", q_ * scale, k_)
        return jnp.sum((jax.nn.softmax(sim, -1) @ v_) ** 2)

    lse = jax.nn.logsumexp(
        jnp.einsum("bnd,bmd->bnm", q * scale, k), axis=-1)
    assert float(lse.max()) < -87.0  # the regime this test exists for

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        assert bool(jnp.isfinite(a).all())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (3, 8, 32, 16)])
def test_packed_conv_matches_xla(shape):
    """conv3x3_packed == lax conv on the unpacked layout (fwd)."""
    from dalle2_video_tpu.ops.pallas.spatial_conv import conv3x3_spatial

    n, h, w, c = shape
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c))
    wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c)) * 0.2
    ref = jax.lax.conv_general_dilated(
        x, wk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = conv3x3_spatial(x, wk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_packed_conv_gradients_match_xla():
    """Custom VJP (dx via transposed-B conv, dw via the wgrad kernel)."""
    from dalle2_video_tpu.ops.pallas.spatial_conv import (
        conv3x3_packed,
        pack_width,
        unpack_width,
    )

    n, h, w, c = 2, 8, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c))
    wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c)) * 0.2

    def loss_pallas(x_, w_):
        return jnp.sum(jnp.square(conv3x3_packed(pack_width(x_), w_, True)))

    def loss_ref(x_, w_):
        y = jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(jnp.square(y))

    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, wk)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-4, atol=1e-3)


def test_packed_conv_rectangular_out_channels():
    """Co != C (e.g. the up-path 2C->C convs feed Co=C/2 shapes)."""
    from dalle2_video_tpu.ops.pallas.spatial_conv import conv3x3_spatial

    n, h, w, c, co = 2, 8, 8, 16, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c))
    wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, co)) * 0.2
    ref = jax.lax.conv_general_dilated(
        x, wk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = conv3x3_spatial(x, wk, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_groupnorm_bwd_all_five_grads():
    """Pallas backward vs oracle on ALL five inputs with nonzero
    beta/shift (round-2 in-kernel backward)."""
    from dalle2_video_tpu.ops.pallas.groupnorm_film import (
        _reference_math,
        groupnorm_film_silu,
    )

    b, l, c, g = 2, 40, 16, 4
    keys = jax.random.split(jax.random.PRNGKey(9), 5)
    x = jax.random.normal(keys[0], (b, l, c))
    gamma = 1.0 + jax.random.normal(keys[1], (c,)) * 0.1
    beta = jax.random.normal(keys[2], (c,)) * 0.2
    scale = jax.random.normal(keys[3], (b, c)) * 0.1
    shift = jax.random.normal(keys[4], (b, c)) * 0.2

    def lk(*args):
        return jnp.sum(groupnorm_film_silu(*args, g, 1e-5, 32, True) ** 2)

    def lo(*args):
        return jnp.sum(_reference_math(*args, g, 1e-5) ** 2)

    gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, scale, shift)
    go = jax.grad(lo, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, scale, shift)
    for a, b_ in zip(gk, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-5)


# --------------------------------------------------------------------- #
# fused Block3D megakernel (conv + bias + GN + FiLM + SiLU)
# --------------------------------------------------------------------- #
def _fused_block_oracle(x, wk, bias, gamma, beta, scale, shift, groups, eps):
    from dalle2_video_tpu.ops.pallas.groupnorm_film import _reference_math

    b, t, h, wd, c = x.shape
    co = wk.shape[3]
    y = jax.lax.conv_general_dilated(
        x.reshape(b * t, h, wd, c), wk, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias[None, None, None, :]
    out = _reference_math(
        y.reshape(b, t * h * wd, co), gamma, beta, scale, shift, groups, eps
    )
    return out.reshape(b, t, h, wd, co)


@pytest.mark.parametrize("shape,co", [((2, 3, 8, 8, 8), 16), ((1, 2, 16, 8, 16), 8)])
def test_fused_block_matches_oracle(shape, co):
    """fused_block3d fwd == conv + GroupNorm + FiLM + SiLU composed in XLA
    (multi-bh-block second case exercises the VMEM halo across fori steps)."""
    from dalle2_video_tpu.ops.pallas.fused_block import fused_block3d

    b, t, h, wd, c = shape
    groups, eps = 4, 1e-5
    keys = jax.random.split(jax.random.PRNGKey(3), 7)
    x = jax.random.normal(keys[0], shape)
    wk = jax.random.normal(keys[1], (3, 3, c, co)) * 0.2
    bias = jax.random.normal(keys[2], (co,)) * 0.1
    gamma = 1.0 + jax.random.normal(keys[3], (co,)) * 0.1
    beta = jax.random.normal(keys[4], (co,)) * 0.2
    scale = jax.random.normal(keys[5], (b, co)) * 0.1
    shift = jax.random.normal(keys[6], (b, co)) * 0.2
    ref = _fused_block_oracle(x, wk, bias, gamma, beta, scale, shift, groups, eps)
    got = fused_block3d(x, wk, bias, gamma, beta, scale, shift, groups, eps, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_fused_block_all_seven_grads():
    """Custom VJP vs oracle autodiff on every differentiable input
    (incl. the closed-form dbias that reuses the kernels' accumulators)."""
    from dalle2_video_tpu.ops.pallas.fused_block import fused_block3d

    b, t, h, wd, c, co, groups = 2, 2, 8, 8, 8, 16, 4
    keys = jax.random.split(jax.random.PRNGKey(4), 7)
    x = jax.random.normal(keys[0], (b, t, h, wd, c))
    wk = jax.random.normal(keys[1], (3, 3, c, co)) * 0.2
    bias = jax.random.normal(keys[2], (co,)) * 0.1
    gamma = 1.0 + jax.random.normal(keys[3], (co,)) * 0.1
    beta = jax.random.normal(keys[4], (co,)) * 0.2
    scale = jax.random.normal(keys[5], (b, co)) * 0.1
    shift = jax.random.normal(keys[6], (b, co)) * 0.2

    def lp(*args):
        return jnp.sum(fused_block3d(*args, groups, 1e-5, True) ** 2)

    def lr(*args):
        return jnp.sum(_fused_block_oracle(*args, groups, 1e-5) ** 2)

    gp = jax.grad(lp, argnums=tuple(range(7)))(x, wk, bias, gamma, beta, scale, shift)
    gr = jax.grad(lr, argnums=tuple(range(7)))(x, wk, bias, gamma, beta, scale, shift)
    names = ["dx", "dw", "dbias", "dgamma", "dbeta", "dscale", "dshift"]
    for name, a, r in zip(names, gp, gr):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name
        )


def test_block3d_fused_matches_xla():
    """Block3D norm_impl='fused' (whole-block megakernel) must match the XLA
    path on the SAME params — the param-tree twin (_SpatialConvParams) makes
    checkpoints interchangeable between impls."""
    import unittest.mock as mock

    from dalle2_video_tpu.models.layers import Block3D
    from dalle2_video_tpu.ops.pallas import fused_block

    # 64-aligned dims: the fused_ok gate now requires c % 64 == 0 and
    # dim_out % 64 == 0 (ADVICE r2 — _build_a is Mosaic-safe only for
    # 64-aligned lane slices); unaligned geometries fall back to XLA
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 2, 8, 8, 64))
    ss = (
        jax.random.normal(jax.random.PRNGKey(1), (2, 64)) * 0.1,
        jax.random.normal(jax.random.PRNGKey(2), (2, 64)) * 0.1,
    )
    xla_block = Block3D(64, groups=4, norm_impl="xla")
    fu_block = Block3D(64, groups=4, norm_impl="fused")
    params = xla_block.init(jax.random.PRNGKey(3), x, ss)
    out_xla = xla_block.apply(params, x, ss)

    orig = fused_block._fwd_impl
    with mock.patch.object(
        fused_block, "_fwd_impl",
        lambda *a: orig(*a[:-1], True),
    ):
        params_fu = fu_block.init(jax.random.PRNGKey(3), x, ss)
        assert jax.tree_util.tree_structure(
            params
        ) == jax.tree_util.tree_structure(params_fu)
        out_fu = fu_block.apply(params, x, ss)
        out_fu_nofilm = fu_block.apply(params, x, None)
    np.testing.assert_allclose(np.asarray(out_fu), np.asarray(out_xla), atol=3e-5)
    out_xla_nofilm = xla_block.apply(params, x, None)
    np.testing.assert_allclose(
        np.asarray(out_fu_nofilm), np.asarray(out_xla_nofilm), atol=3e-5
    )
    # unaligned geometry (reference-exact dim-8 SR stage): must fall back to
    # the XLA path cleanly, not reach the Mosaic-unsafe kernel
    x8 = jax.random.normal(jax.random.PRNGKey(5), (1, 2, 4, 4, 8))
    small = Block3D(16, groups=4, norm_impl="fused")
    p8 = small.init(jax.random.PRNGKey(6), x8, None)
    assert small.apply(p8, x8, None).shape == (1, 2, 4, 4, 16)


def test_spatial_conv_hybrid_xla_backward():
    """conv3x3_spatial_xbwd: Pallas fwd + XLA bwd — fwd and both grads
    match the lax.conv oracle (the production small-stage wiring)."""
    from dalle2_video_tpu.ops.pallas.spatial_conv import conv3x3_spatial_xbwd

    n, h, w, c = 2, 8, 8, 64
    x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c))
    wk = jax.random.normal(jax.random.PRNGKey(1), (3, 3, c, c)) * 0.1

    def loss_pallas(x_, w_):
        return jnp.sum(jnp.square(conv3x3_spatial_xbwd(x_, w_, True)))

    def loss_ref(x_, w_):
        y = jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return jnp.sum(jnp.square(y))

    np.testing.assert_allclose(
        float(loss_pallas(x, wk)), float(loss_ref(x, wk)), rtol=1e-5
    )
    gx_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, wk)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, wk)
    np.testing.assert_allclose(np.asarray(gx_p), np.asarray(gx_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_r), rtol=1e-4, atol=1e-3)


def test_spatial_conv_module_pallas_small_matches_xla():
    """SpatialConv(impl="pallas_small") == default impl: same outputs, same
    gradients, identical param tree (checkpoints interchange)."""
    from dalle2_video_tpu.models.layers import SpatialConv

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 16, 16, 64))
    ref = SpatialConv(64, 3)
    pal = SpatialConv(64, 3, impl="pallas_small")
    p = ref.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(
        pal.init(jax.random.PRNGKey(1), x)
    )
    np.testing.assert_allclose(
        np.asarray(pal.apply(p, x)), np.asarray(ref.apply(p, x)), atol=2e-5
    )
    g_ref = jax.grad(lambda pp: jnp.sum(ref.apply(pp, x) ** 2))(p)
    g_pal = jax.grad(lambda pp: jnp.sum(pal.apply(pp, x) ** 2))(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_pal)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_spatial_conv_pallas_small_fallback_geometries():
    """Non-qualifying sites (large spatial, odd C, 1x1, stride-2) under
    impl="pallas_small" still route through XLA and stay exact."""
    from dalle2_video_tpu.models.layers import SpatialConv

    # large spatial (h*w > 256) -> XLA branch of the same module
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 32, 32, 64))
    ref, pal = SpatialConv(64, 3), SpatialConv(64, 3, impl="pallas_small")
    p = ref.init(jax.random.PRNGKey(1), x)
    np.testing.assert_allclose(
        np.asarray(pal.apply(p, x)), np.asarray(ref.apply(p, x)), atol=2e-5
    )
    # 1x1 conv ignores impl entirely
    ref1, pal1 = SpatialConv(32, 1), SpatialConv(32, 1, impl="pallas_small")
    x1 = jax.random.normal(jax.random.PRNGKey(2), (1, 1, 8, 8, 64))
    p1 = ref1.init(jax.random.PRNGKey(3), x1)
    np.testing.assert_allclose(
        np.asarray(pal1.apply(p1, x1)), np.asarray(ref1.apply(p1, x1)), atol=2e-5
    )


@pytest.mark.parametrize("bwd_impl", ["pallas", "xla_scan"])
def test_flash_mqa_bf16_gradients_close(bwd_impl):
    """bf16 inputs route the backward through bf16 MXU dots with f32
    accumulation — grads stay close to the f32 oracle (rtol ~ bf16)."""
    b, n, m, d = 2, 70, 50, 16
    keys = jax.random.split(jax.random.PRNGKey(9), 3)
    q = jax.random.normal(keys[0], (b, n, d))
    k = jax.random.normal(keys[1], (b, m, d))
    v = jax.random.normal(keys[2], (b, m, d))
    scale = d**-0.5

    def loss_flash(q_, k_, v_):
        out = flash_mqa(q_.astype(jnp.bfloat16), k_.astype(jnp.bfloat16),
                        v_.astype(jnp.bfloat16), sm_scale=scale,
                        block_q=32, block_k=32, interpret=True,
                        bwd_impl=bwd_impl)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_xla(q_, k_, v_):
        sim = jnp.einsum("bnd,bmd->bnm", q_ * scale, k_)
        out = jax.nn.softmax(sim, -1) @ v_
        return jnp.sum(out**2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=0.08)


def test_flash_mqa_negative_logits_unaligned():
    """Unaligned kv with strongly NEGATIVE real logits: the zero-padded
    columns (logit 0) dominate the running max, so the mask-multiply path
    must still recover exact softmax over the real keys."""
    d = 16
    q = jnp.full((1, 8, d), 2.0)
    k = -jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (1, 37, d))) - 1.0
    v = jax.random.normal(jax.random.PRNGKey(1), (1, 37, d))
    scale = d**-0.5
    expected = jax.nn.softmax((q * scale) @ jnp.swapaxes(k, 1, 2), -1) @ v
    got = flash_mqa(q, k, v, sm_scale=scale, block_q=32, block_k=32,
                    interpret=True)  # 37 -> pad 64, padded logits = 0 > real
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_auto_fwd_blocks_thresholds():
    """probe10 (runs/perf_r3_probe10.jsonl): (1024, 2048) fwd blocks win
    at the 23k-token regime; short shapes keep the small blocks so
    padding stays bounded. The bwd ladder is separate (_auto_block_k)."""
    from dalle2_video_tpu.ops.pallas.flash_mqa import (
        _auto_block_k, _auto_fwd_blocks,
    )

    # 23k-token SR bottleneck, 16 heads folded: both upgrades apply
    assert _auto_fwd_blocks(23040 * 16, 23041) == (1024, 2048)
    # 16-frame sampling shape (1025 tokens, 16 heads): big q, small kv
    assert _auto_fwd_blocks(1025 * 16, 1026) == (1024, 512)
    # tiny test shapes stay small both ways
    assert _auto_fwd_blocks(700, 515) == (512, 512)
    # mid-range kv keeps the probe19 1024 block
    assert _auto_fwd_blocks(8192, 5000) == (1024, 1024)
    # the bwd ladder is unchanged by probe10
    assert _auto_block_k(23041) == 1024
    assert _auto_block_k(1026) == 512


def test_flash_mqa_large_q_block_padding():
    """block_q larger than n_q (the auto choice at folded-head sampling
    shapes): padded garbage q rows must be sliced off exactly."""
    d = 32
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (1, 300, d))
    k = jax.random.normal(kk, (1, 170, d))
    v = jax.random.normal(kv, (1, 170, d))
    scale = d**-0.5
    expected = jax.nn.softmax((q * scale) @ jnp.swapaxes(k, 1, 2), axis=-1) @ v
    got = flash_mqa(q, k, v, sm_scale=scale, block_q=1024, block_k=512,
                    interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)
