"""Pipeline parallelism (parallel/pipeline.py): GPipe fill-drain over the
mesh's model axis must be numerically identical to sequential layer
application — forward AND gradients — and the prior's CausalTransformer
must produce the same loss pipelined as local.

Post-parity extension (SURVEY.md §2d): the reference has no pipeline
parallelism (DeepSpeed ZeRO-1 only, reference configs/deepspeed_config.json).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.parallel.mesh import active_mesh, create_mesh
from dalle2_video_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_transformer_params,
    unstack_transformer_params,
)


@pytest.fixture(scope="module")
def pipe_mesh():
    # 4 pipeline stages x 2 data
    return create_mesh(data=2, model=4)


def _toy(key, n_layers=8, dim=8, batch=8):
    kw, kb, kx = jax.random.split(key, 3)
    stacked = {
        "w": jax.random.normal(kw, (n_layers, dim, dim)) * 0.3,
        "b": jax.random.normal(kb, (n_layers, dim)) * 0.1,
    }
    x = jax.random.normal(kx, (batch, dim))
    return stacked, x


def _layer(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _sequential(stacked, x):
    def body(x, p):
        return _layer(p, x), None

    return jax.lax.scan(body, x, stacked)[0]


def test_pipeline_forward_matches_sequential(pipe_mesh):
    stacked, x = _toy(jax.random.PRNGKey(0))
    ref = _sequential(stacked, x)
    for m in (1, 2, 4):
        out = pipeline_apply(_layer, stacked, x, pipe_mesh, microbatches=m)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-6, atol=2e-6)


def test_pipeline_gradients_match_sequential(pipe_mesh):
    stacked, x = _toy(jax.random.PRNGKey(1))

    def loss_pipe(st, x):
        return jnp.sum(pipeline_apply(_layer, st, x, pipe_mesh, microbatches=4) ** 2)

    def loss_seq(st, x):
        return jnp.sum(_sequential(st, x) ** 2)

    gp, gxp = jax.grad(loss_pipe, argnums=(0, 1))(stacked, x)
    gs, gxs = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves((gp, gxp)),
                    jax.tree_util.tree_leaves((gs, gxs))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_pipeline_composes_with_data_parallel(pipe_mesh):
    stacked, x = _toy(jax.random.PRNGKey(2))
    ref = _sequential(stacked, x)
    out = pipeline_apply(
        _layer, stacked, x, pipe_mesh, microbatches=2, batch_axis="data"
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-6, atol=2e-6)


def test_pipeline_dp_gradients_match_sequential(pipe_mesh):
    """Gradient parity with the batch ALSO sharded over 'data' (dp x pp):
    ppermute/psum transposes must compose with the batch sharding."""
    stacked, x = _toy(jax.random.PRNGKey(5))

    def loss_pipe(st, x):
        return jnp.sum(
            pipeline_apply(
                _layer, st, x, pipe_mesh, microbatches=2, batch_axis="data"
            ) ** 2
        )

    def loss_seq(st, x):
        return jnp.sum(_sequential(st, x) ** 2)

    gp = jax.grad(loss_pipe)(stacked, x)
    gs = jax.grad(loss_seq)(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(gp), jax.tree_util.tree_leaves(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_pipeline_broadcast_args(pipe_mesh):
    stacked, x = _toy(jax.random.PRNGKey(3))
    bias = jnp.float32(0.25)

    def layer_b(p, x, b):
        return jnp.tanh(x @ p["w"] + p["b"] + b)

    def seq(st, x):
        def body(x, p):
            return layer_b(p, x, bias), None

        return jax.lax.scan(body, x, st)[0]

    out = pipeline_apply(
        layer_b, stacked, x, pipe_mesh, microbatches=4, broadcast_args=(bias,)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq(stacked, x)),
                               rtol=2e-6, atol=2e-6)


def test_pipeline_rejects_indivisible_layers(pipe_mesh):
    stacked, x = _toy(jax.random.PRNGKey(4), n_layers=6)
    with pytest.raises(ValueError, match="not divisible"):
        pipeline_apply(_layer, stacked, x, pipe_mesh, microbatches=2)


# --------------------------------------------------------------------- #
# CausalTransformer integration
# --------------------------------------------------------------------- #


def _prior_cfg(**kw):
    from dalle2_video_tpu.models.prior import PriorNetworkConfig

    return PriorNetworkConfig(
        dim=16, depth=4, heads=2, dim_head=8, **kw
    )


def _net_inputs(key, b=8, d=16):
    k1, k2, k3 = jax.random.split(key, 3)
    return (
        jax.random.normal(k1, (b, d)),
        jnp.arange(b, dtype=jnp.int32) % 10,
        jax.random.normal(k2, (b, d)),
    )


def test_scan_layers_matches_legacy_layout():
    """scan_layers=True + stacked params == legacy loop, via the converter
    (both directions round-trip)."""
    from dalle2_video_tpu.models.prior import DiffusionPriorNetwork

    net_loop = DiffusionPriorNetwork(_prior_cfg())
    net_scan = DiffusionPriorNetwork(_prior_cfg(scan_layers=True))
    x, t, te = _net_inputs(jax.random.PRNGKey(0))
    params = net_loop.init(jax.random.PRNGKey(1), x, t, text_embed=te)

    tp = params["params"]["transformer"]
    stacked = stack_transformer_params(tp)
    params_scan = {
        "params": {**params["params"], "transformer": stacked}
    }
    out_loop = net_loop.apply(params, x, t, text_embed=te)
    out_scan = net_scan.apply(params_scan, x, t, text_embed=te)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_loop), rtol=1e-5, atol=1e-5
    )

    back = unstack_transformer_params(stacked)
    for a, b in zip(jax.tree_util.tree_leaves(back), jax.tree_util.tree_leaves(tp)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pipelined_prior_network_matches_local(pipe_mesh):
    """The full DiffusionPriorNetwork forward + loss gradients are identical
    with the transformer pipelined over the model axis."""
    from dalle2_video_tpu.models.prior import (
        DiffusionPrior,
        DiffusionPriorConfig,
        DiffusionPriorNetwork,
    )

    cfg_local = _prior_cfg(scan_layers=True)
    cfg_pipe = _prior_cfg(scan_layers=True, pipeline_microbatches=2)
    net_local = DiffusionPriorNetwork(cfg_local)
    net_pipe = DiffusionPriorNetwork(cfg_pipe)
    x, t, te = _net_inputs(jax.random.PRNGKey(2))
    params = net_local.init(jax.random.PRNGKey(3), x, t, text_embed=te)

    out_local = net_local.apply(params, x, t, text_embed=te)
    with active_mesh(pipe_mesh):
        out_pipe = net_pipe.apply(params, x, t, text_embed=te)
    np.testing.assert_allclose(
        np.asarray(out_pipe), np.asarray(out_local), rtol=1e-5, atol=1e-5
    )

    # full training-loss gradient parity through the pipeline
    prior_local = DiffusionPrior(DiffusionPriorConfig(network=cfg_local))
    prior_pipe = DiffusionPrior(DiffusionPriorConfig(network=cfg_pipe))
    ve = jax.random.normal(jax.random.PRNGKey(4), (8, 16))
    rng = jax.random.PRNGKey(5)

    g_local = jax.grad(lambda p: prior_local.loss(p, rng, ve, te))(params)
    with active_mesh(pipe_mesh):
        g_pipe = jax.grad(lambda p: prior_pipe.loss(p, rng, ve, te))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_pipe),
                    jax.tree_util.tree_leaves(g_local)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-5, atol=3e-5)


def test_pipeline_sharding_tree_places_layer_shards(pipe_mesh):
    """params + adam state: 'layers' leaves sharded P(model) on the layer
    axis, everything else replicated."""
    import optax
    from jax.sharding import PartitionSpec as P

    from dalle2_video_tpu.models.prior import DiffusionPriorNetwork
    from dalle2_video_tpu.parallel.pipeline import pipeline_sharding_tree

    net = DiffusionPriorNetwork(_prior_cfg(scan_layers=True))
    x, t, te = _net_inputs(jax.random.PRNGKey(8))
    params = net.init(jax.random.PRNGKey(9), x, t, text_embed=te)
    opt_state = optax.adam(1e-3).init(params)

    for tree in (params, opt_state):
        sh = pipeline_sharding_tree(tree, pipe_mesh)
        flat, _ = jax.tree_util.tree_flatten_with_path(sh)
        n_pipe = 0
        for path, s in flat:
            keys = {getattr(p, "key", None) for p in path}
            if "layers" in keys:
                assert s.spec == P("model"), (path, s.spec)
                n_pipe += 1
            else:
                assert s.spec == P(), (path, s.spec)
        assert n_pipe > 0


def test_pipelined_prior_sampling_matches_local(pipe_mesh):
    """DDIM sampling (network apply inside lax.scan) produces identical
    embeds with the transformer pipelined — the serving/inference path."""
    from dalle2_video_tpu.models.prior import DiffusionPrior, DiffusionPriorConfig

    cfg_local = DiffusionPriorConfig(
        network=_prior_cfg(scan_layers=True), timesteps=20, sample_timesteps=4,
    )
    cfg_pipe = DiffusionPriorConfig(
        network=_prior_cfg(scan_layers=True, pipeline_microbatches=2),
        timesteps=20, sample_timesteps=4,
    )
    p_local = DiffusionPrior(cfg_local)
    p_pipe = DiffusionPrior(cfg_pipe)
    params = p_local.init_params(jax.random.PRNGKey(20))
    te = jax.random.normal(jax.random.PRNGKey(21), (4, 16))
    rng = jax.random.PRNGKey(22)

    ref = p_local.sample_loop(params, rng, te)
    with active_mesh(pipe_mesh):
        out = p_pipe.sample_loop(params, rng, te)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pipeline_off_mesh_falls_back_to_scan():
    """pipeline_microbatches set but no active mesh: the scanned local path
    runs (trainability without a mesh, e.g. unit tests / CPU debugging)."""
    from dalle2_video_tpu.models.prior import DiffusionPriorNetwork

    net = DiffusionPriorNetwork(_prior_cfg(scan_layers=True, pipeline_microbatches=2))
    x, t, te = _net_inputs(jax.random.PRNGKey(6))
    params = net.init(jax.random.PRNGKey(7), x, t, text_embed=te)
    out = net.apply(params, x, t, text_embed=te)  # no active_mesh
    assert np.all(np.isfinite(np.asarray(out)))
