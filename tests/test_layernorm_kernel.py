"""Fused Pallas LayerNorm/RMSNorm: forward + gradient parity vs the XLA
reference implementations (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simlingo_tpu.kernels.layernorm import layernorm_fused, rmsnorm_fused
from simlingo_tpu.models import layers as L


@pytest.mark.parametrize("shape,dtype", [
    ((6, 1025, 1024), jnp.float32),       # ViT token grid
    ((2, 798, 896), jnp.bfloat16),        # LLM rows
    ((3, 64), jnp.float32),               # tiny / odd row count
])
def test_layernorm_forward_parity(shape, dtype):
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, shape, dtype) * 3.0
    scale = jax.random.normal(k2, shape[-1:], jnp.float32) + 1.0
    bias = jax.random.normal(k3, shape[-1:], jnp.float32)
    p = {"scale": scale, "bias": bias}
    ref = L.layernorm(p, x)                       # XLA path (env default)
    out = layernorm_fused(x, scale, bias)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


@pytest.mark.parametrize("shape,dtype", [
    ((4, 257, 896), jnp.float32),
    ((2, 130, 1024), jnp.bfloat16),
])
def test_rmsnorm_forward_parity(shape, dtype):
    key = jax.random.PRNGKey(1)
    k1, k2 = jax.random.split(key)
    x = jax.random.normal(k1, shape, dtype) * 2.0
    scale = jax.random.normal(k2, shape[-1:], jnp.float32) + 1.0
    ref = L.rmsnorm({"scale": scale}, x)
    out = rmsnorm_fused(x, scale)
    tol = 2e-2 if dtype == jnp.bfloat16 else 1e-5
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=tol)


def _xla_ln(x, scale, bias, eps=1e-6):
    return L.layernorm({"scale": scale, "bias": bias}, x, eps)


def _xla_rms(x, scale, eps=1e-6):
    return L.rmsnorm({"scale": scale}, x, eps)


def test_layernorm_grad_parity():
    key = jax.random.PRNGKey(2)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (5, 67, 256), jnp.float32) * 2.0
    scale = jax.random.normal(k2, (256,)) + 1.0
    bias = jax.random.normal(k3, (256,))
    ct = jax.random.normal(k4, x.shape)

    def loss_ref(x, s, b):
        return (_xla_ln(x, s, b) * ct).sum()

    def loss_fused(x, s, b):
        return (layernorm_fused(x, s, b) * ct).sum()

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    g_fus = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-4)


def test_rmsnorm_grad_parity():
    key = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(key, 3)
    x = jax.random.normal(k1, (3, 41, 128), jnp.float32)
    scale = jax.random.normal(k2, (128,)) + 1.0
    ct = jax.random.normal(k3, x.shape)

    g_ref = jax.grad(lambda x, s: (_xla_rms(x, s) * ct).sum(),
                     argnums=(0, 1))(x, scale)
    g_fus = jax.grad(lambda x, s: (rmsnorm_fused(x, s) * ct).sum(),
                     argnums=(0, 1))(x, scale)
    for a, b_ in zip(g_fus, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=2e-4, rtol=1e-4)


def test_env_selected_in_model_path(monkeypatch):
    """SIMLINGO_LN_IMPL=pallas must route models/layers.py through the
    fused kernels with identical results."""
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (2, 33, 64), jnp.bfloat16)
    p = L.layernorm_init(64)
    ref = L.layernorm(p, x)
    monkeypatch.setenv("SIMLINGO_LN_IMPL", "pallas")
    out = L.layernorm(p, x)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
