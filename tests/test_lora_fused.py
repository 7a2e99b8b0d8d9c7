"""Fused LoRA adapter groups (SIMLINGO_LORA_FUSED=1).

q/k/v and gate/up adapters share their input, so the fused path computes
one concatenated-A matmul + one block-diagonal-B matmul (and one shared
dropout mask) per group instead of 2n slivers (models/qwen2.py
_fused_lora_delta). Inference outputs and no-dropout gradients must be
EXACTLY equivalent to the unfused path; with dropout the masks differ by
documented design (shared across the group).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simlingo_tpu.models import qwen2


@pytest.fixture()
def setup():
    cfg = qwen2.Qwen2Config(vocab_size=512, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=2, head_dim=16,
                            intermediate_size=128, lora_r=8, lora_alpha=16,
                            lora_dropout=0.1)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    lora = qwen2.init_lora_params(jax.random.PRNGKey(1), cfg)
    lora = jax.tree_util.tree_map(
        lambda x: jax.random.normal(jax.random.PRNGKey(2), x.shape,
                                    x.dtype) * 0.1, lora)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 64))
    pos = jnp.broadcast_to(jnp.arange(16), (2, 16)).astype(jnp.int32)
    return cfg, params, lora, x, pos


def _with_gate(value):
    prev = os.environ.get("SIMLINGO_LORA_FUSED")
    os.environ["SIMLINGO_LORA_FUSED"] = value
    return prev


def _restore_gate(prev):
    if prev is None:
        os.environ.pop("SIMLINGO_LORA_FUSED", None)
    else:
        os.environ["SIMLINGO_LORA_FUSED"] = prev


def test_fused_matches_unfused_inference(setup):
    cfg, params, lora, x, pos = setup
    prev = _with_gate("0")
    try:
        o0, _ = qwen2.forward(params, x, cfg, pos, lora_params=lora)
        os.environ["SIMLINGO_LORA_FUSED"] = "1"
        o1, _ = qwen2.forward(params, x, cfg, pos, lora_params=lora)
    finally:
        _restore_gate(prev)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(o1), atol=2e-5)


def test_fused_matches_unfused_grads_no_dropout(setup):
    cfg, params, lora, x, pos = setup

    def loss(lp):
        out, _ = qwen2.forward(params, x, cfg, pos, lora_params=lp)
        return jnp.sum(out ** 2)

    prev = _with_gate("0")
    try:
        g0 = jax.grad(loss)(lora)
        os.environ["SIMLINGO_LORA_FUSED"] = "1"
        g1 = jax.grad(loss)(lora)
    finally:
        _restore_gate(prev)
    for l0, l1 in zip(jax.tree_util.tree_leaves(g0),
                      jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                                   atol=5e-4, rtol=1e-3)


def test_fused_dropout_grads_finite_and_flow(setup):
    cfg, params, lora, x, pos = setup

    def loss(lp):
        out, _ = qwen2.forward(params, x, cfg, pos, lora_params=lp,
                               dropout_rng=jax.random.PRNGKey(7))
        return jnp.sum(out ** 2)

    prev = _with_gate("1")
    try:
        g = jax.grad(loss)(lora)
    finally:
        _restore_gate(prev)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert all(float(np.abs(np.asarray(l)).sum()) > 0 for l in leaves)
