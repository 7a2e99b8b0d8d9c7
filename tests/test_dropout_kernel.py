"""Hardware-PRNG pallas dropout (kernels/dropout.py): statistics, scaling,
fwd/bwd mask identity (the VJP re-generates the mask from the seed instead
of storing it)."""

import jax
import jax.numpy as jnp
import numpy as np

from simlingo_tpu.kernels.dropout import hw_dropout, make_seed


def test_dropout_statistics_and_scaling():
    x = jnp.ones((1000, 896), jnp.float32)
    seed = make_seed(jax.random.PRNGKey(3))
    out = np.asarray(hw_dropout(x, seed, 0.1))
    kept = out != 0
    # kept entries are scaled by 1/keep
    np.testing.assert_allclose(out[kept], 1.0 / 0.9, rtol=1e-6)
    # drop rate within 1% absolute of 10%
    assert abs(1 - kept.mean() - 0.1) < 0.01


def test_dropout_deterministic_per_seed():
    x = jnp.asarray(np.random.RandomState(0).randn(64, 128), jnp.float32)
    s1 = make_seed(jax.random.PRNGKey(1))
    s2 = make_seed(jax.random.PRNGKey(2))
    a = np.asarray(hw_dropout(x, s1, 0.2))
    b = np.asarray(hw_dropout(x, s1, 0.2))
    c = np.asarray(hw_dropout(x, s2, 0.2))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


def test_dropout_bwd_uses_same_mask():
    x = jnp.asarray(np.random.RandomState(0).randn(32, 256), jnp.float32)
    seed = make_seed(jax.random.PRNGKey(7))
    out, vjp = jax.vjp(lambda x_: hw_dropout(x_, seed, 0.1), x)
    g = jnp.ones_like(out)
    (dx,) = vjp(g)
    # gradient is exactly mask/keep: zero where dropped, 1/keep where kept
    np.testing.assert_allclose(np.asarray(dx),
                               (np.asarray(out) != 0) / 0.9, rtol=1e-6)


def test_dropout_3d_and_rate_zero_edge():
    x = jnp.ones((2, 33, 896), jnp.bfloat16)   # non-multiple rows get padded
    seed = make_seed(jax.random.PRNGKey(0))
    out = hw_dropout(x, seed, 0.1)
    assert out.shape == x.shape and out.dtype == x.dtype
