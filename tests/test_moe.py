"""Mixture-of-experts FF (models/moe.py): GShard-style dense dispatch must
equal explicit per-token routing in the no-drop regime, drop over-capacity
tokens to the residual, emit the Switch load-balance aux, and give
identical results with the expert axis sharded over the mesh (EP).

Post-parity extension (SURVEY.md §2d): the reference has no MoE anywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.models.moe import MoEFF, moe_sharding_tree


def _init(key, *, dim=8, e=4, mult=2, cap=64.0, swiglu=True, b=2, n=6):
    m = MoEFF(dim, num_experts=e, mult=mult, capacity_factor=cap, swiglu=swiglu)
    x = jax.random.normal(key, (b, n, dim))
    params = m.init(jax.random.PRNGKey(7), x)
    return m, params, x


def _explicit_routing(params, x, *, e, mult, swiglu):
    """Per-token reference: top-2 of the softmaxed router, normalized gates,
    each token through its two experts' MLPs, gate-weighted sum + residual."""
    p = params["params"]
    b, n, d = x.shape
    g = b * n
    scale = p["norm"]["LayerNorm_0"]["scale"]
    y = x.reshape(g, d)
    mu = y.mean(-1, keepdims=True)
    var = ((y - mu) ** 2).mean(-1, keepdims=True)
    y = (y - mu) / np.sqrt(var + 1e-5) * scale

    logits = y @ p["router"]["kernel"]
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = np.zeros((g, d), np.float32)
    for i in range(g):
        top = np.argsort(-np.asarray(probs[i]))[:2]
        gv = np.asarray(probs[i])[top]
        gv = gv / gv.sum()
        for gate, ei in zip(gv, top):
            h = np.asarray(y[i]) @ np.asarray(p["experts_w1"][ei])
            if swiglu:
                a, ga = np.split(h, 2)
                h = a * (ga * (1 / (1 + np.exp(-ga))))
            else:
                from scipy.stats import norm as _n  # pragma: no cover

                raise NotImplementedError
            out[i] += gate * (h @ np.asarray(p["experts_w2"][ei]))
    return x + out.reshape(b, n, d)


def test_moe_matches_explicit_routing():
    """No-drop regime (huge capacity): dense dispatch == per-token loop."""
    m, params, x = _init(jax.random.PRNGKey(0))
    out = m.apply(params, x)
    ref = _explicit_routing(params, x, e=4, mult=2, swiglu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_moe_single_expert_is_dense_ff():
    """E=1 degenerates to one dense expert MLP + residual (gate == 1)."""
    m, params, x = _init(jax.random.PRNGKey(1), e=1)
    out = m.apply(params, x)
    ref = _explicit_routing(params, x, e=1, mult=2, swiglu=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_moe_capacity_drops_to_residual():
    """Zero router logits tie-break to experts (0, 1) for every token; with
    capacity 1 per expert only the first token gets expert compute — the
    rest must pass through on the residual exactly."""
    dim, e = 8, 4
    b, n = 1, 6
    m = MoEFF(dim, num_experts=e, mult=2, capacity_factor=e / n)  # cap = 1
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, dim))
    params = m.init(jax.random.PRNGKey(3), x)
    params = jax.tree_util.tree_map(lambda a: a, params)  # unfreeze-safe copy
    params["params"]["router"]["kernel"] = jnp.zeros_like(
        params["params"]["router"]["kernel"]
    )
    out = m.apply(params, x)
    # token 0 occupies both experts' single slot; tokens 1.. are dropped
    np.testing.assert_allclose(
        np.asarray(out)[0, 1:], np.asarray(x)[0, 1:], rtol=1e-6, atol=1e-6
    )
    assert not np.allclose(np.asarray(out)[0, 0], np.asarray(x)[0, 0])


def test_moe_aux_loss_uniform_vs_collapsed():
    """Switch aux == 1 at uniform router probs; -> E when collapsed."""
    dim, e = 8, 4
    m = MoEFF(dim, num_experts=e, mult=2, capacity_factor=8.0)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 8, dim))
    params = m.init(jax.random.PRNGKey(5), x)
    params = jax.tree_util.tree_map(lambda a: a, params)

    params["params"]["router"]["kernel"] = jnp.zeros((dim, e))
    _, sown = m.apply(params, x, mutable=["losses"])
    aux_uniform = float(jax.tree_util.tree_leaves(sown["losses"])[0])
    np.testing.assert_allclose(aux_uniform, 1.0, rtol=1e-5)

    # a sharply non-uniform router must score >= uniform (minimum of the
    # Switch aux is 1 at balance; hard collapse approaches E)
    params["params"]["router"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(8), (dim, e)) * 10.0
    )
    _, sown = m.apply(params, x, mutable=["losses"])
    aux_skewed = float(jax.tree_util.tree_leaves(sown["losses"])[0])
    assert aux_skewed >= 1.0 - 1e-5


def test_moe_ep_sharded_matches_local(mesh8):
    """Experts sharded P('model') over the mesh: identical outputs."""
    m, params, x = _init(jax.random.PRNGKey(9), e=4, b=4, n=8)
    ref = m.apply(params, x)
    sh = moe_sharding_tree(params, mesh8)
    from jax.sharding import PartitionSpec as P

    flat, _ = jax.tree_util.tree_flatten_with_path(sh)
    assert any(s.spec == P("model") for _, s in flat), "no expert leaf sharded"
    params_sh = jax.tree_util.tree_map(jax.device_put, params, sh)
    out = jax.jit(m.apply)(params_sh, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_prior_moe_loss_and_grads():
    """Prior with MoE FF: finite loss, expert grads flow, aux weight counts."""
    import dataclasses

    from dalle2_video_tpu.models.prior import (
        DiffusionPrior, DiffusionPriorConfig, PriorNetworkConfig,
    )

    ncfg = PriorNetworkConfig(
        dim=16, depth=2, heads=2, dim_head=8, ff_experts=2,
        moe_aux_weight=0.0,
    )
    prior = DiffusionPrior(DiffusionPriorConfig(network=ncfg, timesteps=20))
    params = prior.init_params(jax.random.PRNGKey(10))
    ve = jax.random.normal(jax.random.PRNGKey(11), (4, 16))
    te = jax.random.normal(jax.random.PRNGKey(12), (4, 16))
    rng = jax.random.PRNGKey(13)

    loss0, grads = jax.value_and_grad(
        lambda p: prior.loss(p, rng, ve, te))(params)
    assert np.isfinite(float(loss0))
    gnorm = jnp.linalg.norm(
        grads["params"]["transformer"]["ff0"]["experts_w1"])
    assert float(gnorm) > 0.0

    ncfg_aux = dataclasses.replace(ncfg, moe_aux_weight=1.0)
    prior_aux = DiffusionPrior(
        DiffusionPriorConfig(network=ncfg_aux, timesteps=20))
    loss_aux = prior_aux.loss(params, rng, ve, te)
    assert float(loss_aux) > float(loss0), "aux loss not added"


def test_prior_moe_scan_layers(mesh8):
    """MoE composes with scan_layers: stacked (depth, E, ...) expert leaves
    are sharded on dim 1 (the expert axis — dim 0 is depth) and outputs
    match the local run."""
    from jax.sharding import PartitionSpec as P

    from dalle2_video_tpu.models.prior import DiffusionPriorNetwork, PriorNetworkConfig

    ncfg = PriorNetworkConfig(
        dim=16, depth=2, heads=2, dim_head=8, ff_experts=4, scan_layers=True,
    )
    net = DiffusionPriorNetwork(ncfg)
    x = jax.random.normal(jax.random.PRNGKey(14), (4, 16))
    t = jnp.zeros((4,), jnp.int32)
    te = jax.random.normal(jax.random.PRNGKey(15), (4, 16))
    params = net.init(jax.random.PRNGKey(16), x, t, text_embed=te)
    ref = net.apply(params, x, t, text_embed=te)
    sh = moe_sharding_tree(params, mesh8)
    expert_specs = [
        s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
        if any(str(getattr(p, "key", "")).startswith("experts_") for p in path)
    ]
    assert expert_specs and all(sp == P(None, "model") for sp in expert_specs)
    params_sh = jax.tree_util.tree_map(jax.device_put, params, sh)
    out = jax.jit(
        lambda p: net.apply(p, x, t, text_embed=te))(params_sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
