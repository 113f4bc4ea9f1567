"""Diffusion math core tests (SURVEY.md §4 test strategy, item 1):
scheduler identities, v/eps/x0 round-trips, beta schedules vs closed form,
VLB helper sanity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.diffusion import (
    DiffusionSchedule,
    discretized_gaussian_log_likelihood,
    make_beta_schedule,
    normal_kl,
)


def test_linear_betas_closed_form():
    T = 1000
    betas = make_beta_schedule("linear", T)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    assert np.all(np.diff(betas) > 0)


def test_cosine_betas_match_nichol_dhariwal():
    T = 100
    betas = make_beta_schedule("cosine", T)
    s = 0.008
    f = lambda t: np.cos((t / T + s) / (1 + s) * np.pi / 2) ** 2
    acp = np.cumprod(1 - betas)
    # alphas_cumprod should track f(t)/f(0) wherever clipping didn't bite
    expected = np.array([f(t + 1) / f(0) for t in range(T)])
    np.testing.assert_allclose(acp[:-5], expected[:-5], rtol=1e-6)
    assert betas.max() <= 0.999


@pytest.mark.parametrize("name", ["linear", "cosine", "quadratic", "jsd", "sqrt"])
def test_all_schedules_valid(name):
    betas = make_beta_schedule(name, 200)
    assert betas.shape == (200,)
    assert np.all(betas > 0) and np.all(betas <= 1.0)


@pytest.fixture(scope="module")
def sched():
    return DiffusionSchedule.create("cosine", timesteps=100, loss_type="l2")


def test_q_sample_terminal_snr(sched):
    """At large t, q_sample output is nearly pure noise; at t=0, nearly x0."""
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t0 = jnp.zeros((2,), jnp.int32)
    xt = sched.q_sample(x0, t0, noise)
    a0 = float(sched.sqrt_alphas_cumprod[0])
    assert a0 > 0.99
    np.testing.assert_allclose(
        np.asarray(xt),
        a0 * np.asarray(x0) + float(sched.sqrt_one_minus_alphas_cumprod[0]) * np.asarray(noise),
        rtol=1e-5,
    )


def test_eps_x0_roundtrip(sched):
    rng = jax.random.PRNGKey(2)
    x0 = jax.random.normal(rng, (3, 2, 4, 4, 3))
    noise = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
    t = jnp.array([5, 50, 99], jnp.int32)
    xt = sched.q_sample(x0, t, noise)
    x0_rec = sched.predict_start_from_noise(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-3)
    eps_rec = sched.predict_noise_from_start(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-2)


def test_v_roundtrip(sched):
    rng = jax.random.PRNGKey(4)
    x0 = jax.random.normal(rng, (2, 4, 4, 3))
    noise = jax.random.normal(jax.random.PRNGKey(5), x0.shape)
    t = jnp.array([10, 90], jnp.int32)
    xt = sched.q_sample(x0, t, noise)
    v = sched.calculate_v(x0, t, noise)
    x0_rec = sched.predict_start_from_v(xt, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_q_posterior_consistency(sched):
    """Posterior mean must interpolate between x0 (t small) and x_t."""
    x0 = jnp.ones((1, 4, 4, 1))
    xt = -jnp.ones((1, 4, 4, 1))
    t = jnp.array([0], jnp.int32)
    mean, var, logvar = sched.q_posterior(x0, xt, t)
    # at t=0, alphas_cumprod_prev == 1 -> coef1 ~ beta0/(1-acp0) ~ 1, coef2 ~ 0
    np.testing.assert_allclose(np.asarray(mean), np.ones_like(mean), atol=1e-3)
    assert np.all(np.asarray(var) >= 0)


def test_q_sample_from_to_matches_direct(sched):
    """Renoising from t1 to t2 must have the same marginal as direct q_sample."""
    rng = jax.random.PRNGKey(6)
    keys = jax.random.split(rng, 3)
    n = 200_000
    x0 = jnp.zeros((n, 1))
    t1 = jnp.full((n,), 20, jnp.int32)
    t2 = jnp.full((n,), 60, jnp.int32)
    x_t1 = sched.q_sample(x0, t1, jax.random.normal(keys[0], x0.shape))
    x_t2 = sched.q_sample_from_to(x_t1, t1, t2, jax.random.normal(keys[1], x0.shape))
    # marginal std at t2 should be sqrt(1 - acp_t2) around mean sqrt(acp_t2)*x0=0
    expected_std = float(sched.sqrt_one_minus_alphas_cumprod[60])
    assert np.std(np.asarray(x_t2)) == pytest.approx(expected_std, rel=0.02)


def test_p2_weight_identity_when_gamma_zero(sched):
    loss = jnp.ones((4, 7))
    t = jnp.array([0, 10, 50, 99], jnp.int32)
    np.testing.assert_allclose(np.asarray(sched.p2_reweigh_loss(loss, t)), 1.0)


def test_p2_weight_gamma_one():
    s = DiffusionSchedule.create("cosine", 100, p2_loss_weight_gamma=1.0)
    acp = np.asarray(s.alphas_cumprod)
    expected = (1.0 + acp / (1 - acp)) ** -1.0
    # rtol accounts for f32 cancellation in (1 - acp) near t=0
    np.testing.assert_allclose(np.asarray(s.p2_loss_weight), expected, rtol=1e-3)


@pytest.mark.parametrize("loss_type", ["l1", "l2", "huber"])
def test_loss_fns(loss_type):
    s = DiffusionSchedule.create("linear", 10, loss_type=loss_type)
    pred = jnp.array([0.0, 2.0, -3.0])
    target = jnp.array([0.5, 0.0, 0.0])
    got = np.asarray(s.loss_fn(pred, target))
    if loss_type == "l1":
        np.testing.assert_allclose(got, [0.5, 2.0, 3.0])
    elif loss_type == "l2":
        np.testing.assert_allclose(got, [0.25, 4.0, 9.0])
    else:  # huber delta=1
        np.testing.assert_allclose(got, [0.125, 1.5, 2.5])


def test_normal_kl_zero_for_identical():
    m = jnp.array([0.3, -1.2])
    lv = jnp.array([0.1, -0.5])
    np.testing.assert_allclose(np.asarray(normal_kl(m, lv, m, lv)), 0.0, atol=1e-7)


def test_normal_kl_standard_formula():
    # KL(N(1,1) || N(0,1)) = 0.5
    got = float(normal_kl(jnp.array(1.0), jnp.array(0.0), jnp.array(0.0), jnp.array(0.0)))
    assert got == pytest.approx(0.5)


def test_discretized_gaussian_ll_peaks_at_mean():
    x = jnp.linspace(-1, 1, 255)
    ll = discretized_gaussian_log_likelihood(
        x, means=jnp.zeros_like(x), log_scales=jnp.full_like(x, -4.0)
    )
    assert jnp.argmax(ll) == 127  # center bin
    # probabilities across all bins sum to ~1
    total = jnp.sum(jnp.exp(ll)) * 1.0
    assert 0.5 < float(total) < 1.5


def test_sample_random_times_range(sched):
    t = sched.sample_random_times(jax.random.PRNGKey(0), 1000)
    assert int(t.min()) >= 0 and int(t.max()) < sched.num_timesteps
