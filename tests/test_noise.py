import numpy as np
import jax
import jax.numpy as jnp

from certifiedgpt_tpu.ops.noise import _noisy_tile_xla, noisy_tile


def test_noisy_tile_moments_and_determinism():
    x = jnp.asarray(np.random.RandomState(0).randn(16, 16, 3), jnp.float32)
    key = jax.random.PRNGKey(3)
    out = noisy_tile(x, 64, 0.5, key)
    assert out.shape == (64, 16, 16, 3)
    resid = (np.asarray(out) - np.asarray(x)[None]) / 0.5
    assert abs(resid.mean()) < 0.02
    assert abs(resid.std() - 1.0) < 0.02
    # per-draw independence
    assert not np.allclose(np.asarray(out)[0], np.asarray(out)[1])
    # keyed determinism
    out2 = noisy_tile(x, 64, 0.5, key)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_noisy_tile_sigma_zero_is_pure_tile():
    x = jnp.asarray(np.random.RandomState(0).randn(8, 8, 3), jnp.float32)
    out = noisy_tile(x, 4, 0.0, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(out), np.broadcast_to(np.asarray(x)[None], (4, 8, 8, 3))
    )


def test_xla_fallback_matches_distribution_of_jax_normal():
    x = jnp.zeros((8, 8, 3), jnp.float32)
    out = _noisy_tile_xla(x, 32, 1.0, jax.random.PRNGKey(1))
    flat = np.asarray(out).ravel()
    assert abs(flat.mean()) < 0.05
    assert abs(flat.std() - 1.0) < 0.05
