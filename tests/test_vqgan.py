"""VQGAN-VAE adversarial training stack (discriminator, hinge losses,
adaptive-lambda trainer, entry point smoke)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dalle2_video_tpu.models.discriminator import (
    PatchDiscriminator,
    hinge_d_loss,
    hinge_g_loss,
)
from dalle2_video_tpu.models.vqvae import VQVAE
from dalle2_video_tpu.train.vqgan_trainer import (
    VQGanTrainer,
    VQGanTrainerConfig,
    gradient_l1,
)


def tiny_trainer(disc_start=0):
    vae = VQVAE(latent_dim=4, base_dim=8, num_down=1, codebook_size=16)
    disc = PatchDiscriminator(base_dim=8, num_layers=1)
    return VQGanTrainer(
        vae, disc,
        VQGanTrainerConfig(lr_g=1e-3, lr_d=1e-3, disc_start=disc_start),
    )


def test_discriminator_patch_logits_shape():
    disc = PatchDiscriminator(base_dim=8, num_layers=2)
    x = jnp.zeros((2, 3, 32, 32, 3))
    params = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(params, x)
    # frames folded into batch; 2 stride-2 stages (last layer is stride 1)
    assert out.shape[0] == 6 and out.shape[-1] == 1
    assert out.shape[1] < 32


def test_hinge_losses_signs():
    good_real = jnp.full((4, 4, 1), 2.0)
    good_fake = jnp.full((4, 4, 1), -2.0)
    assert float(hinge_d_loss(good_real, good_fake)) == 0.0
    bad = float(hinge_d_loss(-good_real, -good_fake))
    assert bad > 0.0
    # generator wants fake logits high
    assert float(hinge_g_loss(good_fake)) > float(hinge_g_loss(good_real))


def test_gradient_l1_zero_on_identical():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 2, 16, 16, 3))
    assert float(gradient_l1(x, x)) == 0.0
    y = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 16, 16, 3))
    assert float(gradient_l1(x, y)) > 0.0


def test_train_step_improves_recon():
    trainer = tiny_trainer(disc_start=10_000)  # pure recon regime
    state = trainer.init_state(jax.random.PRNGKey(0), frame_size=16, frames=2)
    video = jax.random.uniform(jax.random.PRNGKey(1), (2, 2, 16, 16, 3))
    step = jax.jit(trainer.train_step)
    state, m0 = step(state, video)
    for _ in range(30):
        state, m = step(state, video)
    assert float(m["loss/rec"]) < float(m0["loss/rec"])
    assert np.isfinite(float(m["loss/rec"]))


def test_disc_gating_before_start():
    """Before disc_start: lambda==0 (no adversarial push) and d_loss==0
    (discriminator grads gated); after: both active."""
    trainer = tiny_trainer(disc_start=5)
    state = trainer.init_state(jax.random.PRNGKey(0), frame_size=16, frames=2)
    video = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 16, 16, 3))
    step = jax.jit(trainer.train_step)
    state, m = step(state, video)
    assert float(m["lambda_adapt"]) == 0.0
    assert float(m["loss/d"]) == 0.0
    d0 = state.disc_params
    for _ in range(5):
        state, m = step(state, video)
    assert float(m["lambda_adapt"]) > 0.0
    # disc params actually moved once the gate opened
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), d0, state.disc_params
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0


def test_state_is_pytree():
    trainer = tiny_trainer()
    state = trainer.init_state(jax.random.PRNGKey(0), frame_size=16, frames=2)
    leaves = jax.tree_util.tree_leaves(state)
    assert len(leaves) > 0


def test_train_vqgan_script_smoke(tmp_path):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "scripts/train_vqgan.py", "smoke=true",
         "platform=cpu", f"run_dir={tmp_path}", "use_wandb=false"],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "vqgan_default" / "last").exists() or any(
        tmp_path.iterdir()
    ), "no checkpoint written"


def test_ema_codebook_update_closed_form():
    """One EMA step matches the van den Oord A.1 recurrences computed by
    hand (decayed counts/sums + Laplace-smoothed normalization)."""
    from dalle2_video_tpu.models.vqvae import ema_codebook_update

    k, d, decay, eps = 4, 2, 0.9, 1e-5
    cb = jnp.asarray(np.arange(k * d, dtype=np.float32).reshape(k, d))
    cs = jnp.asarray(np.array([1.0, 0.5, 0.0, 2.0], np.float32))
    ea = cb * cs[:, None]
    z = jnp.asarray(np.array([[0.0, 1.0], [2.0, 3.0], [4.0, 5.0]], np.float32))
    idx = jnp.asarray(np.array([0, 0, 2], np.int32))

    new_cb, new_cs, new_ea = ema_codebook_update(
        cb, cs, ea, z, idx, decay=decay, eps=eps
    )

    counts = np.array([2.0, 0.0, 1.0, 0.0], np.float32)
    sums = np.array([[2.0, 4.0], [0, 0], [4.0, 5.0], [0, 0]], np.float32)
    exp_cs = decay * np.asarray(cs) + (1 - decay) * counts
    exp_ea = decay * np.asarray(ea) + (1 - decay) * sums
    n = exp_cs.sum()
    smoothed = (exp_cs + eps) / (n + k * eps) * n
    np.testing.assert_allclose(np.asarray(new_cs), exp_cs, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(new_ea), exp_ea, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_cb), exp_ea / smoothed[:, None], rtol=1e-5
    )


def test_ema_codebook_training_moves_codes_without_gradients():
    """codebook_ema=True: the quantizer contributes NO codebook gradient
    (stop_gradient + no embed term), yet training moves used codes toward
    the encoder's latents via the EMA statistics."""
    vae = VQVAE(latent_dim=4, base_dim=8, num_down=1, codebook_size=16,
                codebook_ema=True, ema_decay=0.8)
    tr = VQGanTrainer(vae, PatchDiscriminator(base_dim=8, num_layers=1),
                      VQGanTrainerConfig(disc_start=2))
    state = tr.init_state(jax.random.PRNGKey(0), frame_size=8, frames=2)
    assert state.vq_ema is not None

    video = jax.random.uniform(jax.random.PRNGKey(1), (2, 2, 8, 8, 3))
    step = jax.jit(tr.train_step)

    cb0 = np.asarray(state.vae_params["vq"]["params"]["codebook"])
    # the codebook gets exactly zero GRADIENT...
    def loss_fn(vp):
        _, vq_loss, _, _ = tr._recon(vp, video, with_codes=True)
        return vq_loss
    g = jax.grad(loss_fn)(state.vae_params)
    assert float(np.abs(np.asarray(g["vq"]["params"]["codebook"])).max()) == 0.0

    for _ in range(5):
        state, metrics = step(state, video)
    assert np.isfinite(float(metrics["loss/rec"]))

    cb5 = np.asarray(state.vae_params["vq"]["params"]["codebook"])
    assert float(np.abs(cb5 - cb0).max()) > 1e-4  # ...yet it moved (EMA)

    # used codes ended closer to the latents they quantize
    z = vae._enc().apply(state.vae_params["encoder"], video)
    _, idx, _ = vae._vq().apply(state.vae_params["vq"], z)
    flat = np.asarray(z).reshape(-1, 4)
    ids = np.asarray(idx).reshape(-1)
    d5 = np.mean(np.sum((flat - cb5[ids]) ** 2, axis=1))
    d0 = np.mean(np.sum((flat - cb0[ids]) ** 2, axis=1))
    assert d5 < d0
