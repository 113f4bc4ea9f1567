"""utils/keys.py: batched per-row PRNG key plumbing (serving reproducibility)."""

import jax
import jax.numpy as jnp
import numpy as np

from dalle2_video_tpu.utils import keys as keyutil


def test_single_key_passthrough():
    k = jax.random.PRNGKey(0)
    assert not keyutil.is_batched(k)
    np.testing.assert_array_equal(
        np.asarray(keyutil.split(k, 3)), np.asarray(jax.random.split(k, 3))
    )
    np.testing.assert_array_equal(
        np.asarray(keyutil.normal(k, (2, 4))),
        np.asarray(jax.random.normal(k, (2, 4))),
    )
    np.testing.assert_array_equal(
        np.asarray(keyutil.fold_in(k, 7)),
        np.asarray(jax.random.fold_in(k, 7)),
    )


def test_batched_split_aligns_rows():
    ks = keyutil.batch_keys([3, 5])
    assert keyutil.is_batched(ks) and keyutil.batch_size(ks) == 2
    out = keyutil.split(ks, 4)  # (4, 2, 2): out[i] is a batched key
    assert out.shape == (4, 2, 2)
    for row, seed in enumerate([3, 5]):
        expect = jax.random.split(jax.random.PRNGKey(seed), 4)
        np.testing.assert_array_equal(np.asarray(out[:, row]), np.asarray(expect))


def test_batched_normal_is_row_independent():
    ks = keyutil.batch_keys([3, 5, 9])
    full = keyutil.normal(ks, (3, 4, 4))
    # row i depends ONLY on key i — not on batch size, order, or neighbors
    solo = keyutil.normal(keyutil.take(ks, 1, 1), (1, 4, 4))
    np.testing.assert_array_equal(np.asarray(full[1]), np.asarray(solo[0]))
    perm = keyutil.normal(ks[::-1], (3, 4, 4))
    np.testing.assert_array_equal(np.asarray(perm[0]), np.asarray(full[2]))


def test_batch_keys_matches_prngkey():
    ks = keyutil.batch_keys([42, 7])
    np.testing.assert_array_equal(
        np.asarray(ks[0]), np.asarray(jax.random.PRNGKey(42))
    )
    np.testing.assert_array_equal(
        np.asarray(ks[1]), np.asarray(jax.random.PRNGKey(7))
    )


def test_typed_keys_supported():
    k = jax.random.key(0)
    assert not keyutil.is_batched(k)
    ks = jax.vmap(jax.random.key)(jnp.arange(3, dtype=jnp.uint32))
    assert keyutil.is_batched(ks)
    out = keyutil.normal(ks, (3, 2))
    solo = keyutil.normal(ks[1:2], (1, 2))
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(solo[0]))
