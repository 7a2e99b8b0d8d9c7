"""Flash-attention kernel: pallas (interpret on CPU) vs jnp reference vs torch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simlingo_tpu.kernels.flash_attention import (
    attention_reference, flash_attention)


def _rand_qkv(key, B, T, S, HQ, HK, D, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    q = jax.random.normal(k1, (B, T, HQ, D), dtype)
    k = jax.random.normal(k2, (B, S, HK, D), dtype)
    v = jax.random.normal(k3, (B, S, HK, D), dtype)
    return q, k, v


def test_reference_matches_torch_sdpa():
    """Reference impl vs torch scaled_dot_product_attention (causal + GQA)."""
    torch = pytest.importorskip("torch")
    B, T, HQ, HK, D = 2, 64, 4, 2, 32
    q, k, v = _rand_qkv(jax.random.PRNGKey(0), B, T, T, HQ, HK, D)
    out = attention_reference(q, k, v, None, causal=True)

    tq = torch.tensor(np.asarray(q)).permute(0, 2, 1, 3)
    tk = torch.tensor(np.asarray(k)).permute(0, 2, 1, 3)
    tv = torch.tensor(np.asarray(v)).permute(0, 2, 1, 3)
    ref = torch.nn.functional.scaled_dot_product_attention(
        tq, tk, tv, is_causal=True, enable_gqa=True)
    ref = ref.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("T,S", [(256, 256), (200, 200)])
def test_flash_matches_reference(causal, T, S):
    B, HQ, HK, D = 2, 4, 2, 64
    key = jax.random.PRNGKey(1)
    q, k, v = _rand_qkv(key, B, T, S, HQ, HK, D)
    # some padded keys at the end
    n_valid = S - 37
    kv_valid = jnp.arange(S)[None, :] < jnp.array([n_valid, S])[:, None]

    out_ref = attention_reference(q, k, v, kv_valid, causal=causal)
    out = flash_attention(q, k, v, kv_valid, causal=causal,
                          block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_gradients_match_reference():
    B, T, HQ, HK, D = 1, 128, 2, 1, 64
    key = jax.random.PRNGKey(2)
    q, k, v = _rand_qkv(key, B, T, T, HQ, HK, D)
    kv_valid = jnp.arange(T)[None, :] < (T - 19)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, kv_valid, causal=True,
                            block_q=128, block_k=128)
        return (o * jnp.cos(jnp.arange(o.size).reshape(o.shape))).sum()

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, kv_valid, causal=True)
        return (o * jnp.cos(jnp.arange(o.size).reshape(o.shape))).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_fully_masked_rows_are_finite():
    """Rows with zero valid keys (left-pad query slots at inference) must be
    FINITE; their values are unspecified -- nothing downstream reads them and
    their cotangents are zero (kernel contract, see _fwd_kernel docstring).
    Gradients flowing through such rows must be exactly zero."""
    B, T, HQ, HK, D = 1, 128, 2, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(3), B, T, T, HQ, HK, D)
    kv_valid = jnp.zeros((B, T), dtype=bool)
    out = flash_attention(q, k, v, kv_valid, causal=True)
    assert np.all(np.isfinite(np.asarray(out)))

    # zero cotangents for the masked rows (the only supported use); eager
    # vjp so the backward kernel actually executes
    out2, vjp = jax.vjp(
        lambda q, k, v: flash_attention(q, k, v, kv_valid, causal=True),
        q, k, v)
    dq, dk, dv = vjp(jnp.zeros_like(out2))
    for g in (dq, dk, dv):
        assert np.all(np.isfinite(np.asarray(g)))
        np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-6)


def test_lane_major_matches_reference():
    """bt_hd (lane-major [B, T, H*D]) path: forward + gradients match the
    head-structured reference exactly -- same kernel math, different HBM
    layout (no 64-lane padding; VERDICT r2 throughput lever)."""
    B, T, H, D = 2, 256, 4, 64
    key = jax.random.PRNGKey(7)
    q, k, v = _rand_qkv(key, B, T, T, H, H, D)
    qf = q.reshape(B, T, H * D)
    kf = k.reshape(B, T, H * D)
    vf = v.reshape(B, T, H * D)
    kv_valid = jnp.arange(T)[None, :] < (T - 13)

    for causal in (False, True):
        out_lm = flash_attention(qf, kf, vf, kv_valid, causal=causal,
                                 layout="bt_hd", num_heads=H)
        out_ref = attention_reference(q, k, v, kv_valid, causal=causal)
        np.testing.assert_allclose(
            np.asarray(out_lm), np.asarray(out_ref.reshape(B, T, H * D)),
            atol=2e-2, rtol=2e-2)

    def loss_lm(q_, k_, v_):
        o = flash_attention(q_, k_, v_, kv_valid, causal=True,
                            layout="bt_hd", num_heads=H)
        return (o * jnp.cos(jnp.arange(o.size).reshape(o.shape))).sum()

    def loss_ref(q_, k_, v_):
        o = attention_reference(q_.reshape(B, T, H, D),
                                k_.reshape(B, T, H, D),
                                v_.reshape(B, T, H, D), kv_valid,
                                causal=True).reshape(B, T, H * D)
        return (o * jnp.cos(jnp.arange(o.size).reshape(o.shape))).sum()

    g_lm = jax.grad(loss_lm, argnums=(0, 1, 2))(qf, kf, vf)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(qf, kf, vf)
    for gl, gr, name in zip(g_lm, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(gr),
                                   atol=1e-4, rtol=1e-4, err_msg=name)


def test_lane_major_unpadded_length():
    """bt_hd with a non-128-multiple sequence (ViT: 1025 tokens) pads rows
    internally and slices back."""
    B, T, H, D = 1, 130, 2, 64
    q, k, v = _rand_qkv(jax.random.PRNGKey(9), B, T, T, H, H, D)
    out_lm = flash_attention(q.reshape(B, T, -1), k.reshape(B, T, -1),
                             v.reshape(B, T, -1), None, causal=False,
                             layout="bt_hd", num_heads=H)
    out_ref = attention_reference(q, k, v, None, causal=False)
    assert out_lm.shape == (B, T, H * D)
    np.testing.assert_allclose(np.asarray(out_lm),
                               np.asarray(out_ref.reshape(B, T, -1)),
                               atol=2e-2, rtol=2e-2)
