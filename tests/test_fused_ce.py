"""Fused Pallas CE (kernels/fused_ce.py) parity vs the XLA reference.

Runs in interpret mode on CPU; shapes use a non-block-multiple vocab to
exercise the boundary-tile masking and a tied [V, H] head like
production (qwen2 embed table)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simlingo_tpu.kernels.fused_ce import fused_ce
from simlingo_tpu.models import adaptors as A

N, H, V = 24, 64, 1111   # V deliberately not a multiple of the tile


def _ref_ce(h2, labels, w):
    logits = (h2 @ w.astype(h2.dtype).T).astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return logz - gold


@pytest.fixture()
def data():
    key = jax.random.PRNGKey(0)
    h2 = jax.random.normal(key, (N, H), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (V, H), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, V)
    return h2, labels, w


def test_forward_parity(data):
    h2, labels, w = data
    ce = jax.jit(fused_ce)(h2, labels, w)
    np.testing.assert_allclose(np.asarray(ce), np.asarray(_ref_ce(h2, labels, w)),
                               rtol=2e-5, atol=2e-5)


def test_grad_parity(data):
    h2, labels, w = data
    gmask = jnp.linspace(0.2, 1.7, N)   # non-uniform cotangent

    def loss_fused(h):
        return (fused_ce(h, labels, w) * gmask).sum()

    def loss_ref(h):
        return (_ref_ce(h, labels, w) * gmask).sum()

    g_f = jax.jit(jax.grad(loss_fused))(h2)
    g_r = jax.jit(jax.grad(loss_ref))(h2)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_r),
                               rtol=5e-3, atol=5e-3)


def test_no_head_grad(data):
    """The head is the frozen tied embedding: its cotangent is exactly 0."""
    h2, labels, w = data
    gw = jax.jit(jax.grad(lambda ww: fused_ce(h2, labels, ww).sum()))(w)
    assert float(jnp.abs(gw).max()) == 0.0


def test_dw_parity(data):
    """compute_dw=True streams the real head gradient (full-finetune)."""
    h2, labels, w = data
    gmask = jnp.linspace(0.2, 1.7, N)

    def loss_fused(h, ww):
        return (fused_ce(h, labels, ww, True) * gmask).sum()

    def loss_ref(h, ww):
        return (_ref_ce(h, labels, ww) * gmask).sum()

    gh_f, gw_f = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(h2, w)
    gh_r, gw_r = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(h2, w)
    np.testing.assert_allclose(np.asarray(gh_f), np.asarray(gh_r),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r),
                               rtol=5e-3, atol=5e-3)


def test_trainable_embed_builds_with_pallas_dw(monkeypatch):
    """SIMLINGO_CE_IMPL=pallas_dw lifts the frozen-embed restriction."""
    monkeypatch.setenv("SIMLINGO_CE_IMPL", "pallas_dw")
    from simlingo_tpu.core import presets
    from simlingo_tpu.train import train_step as ts

    cfg = presets.small_shardable()
    opt = ts.make_optimizer(ts.OptimizerConfig(total_steps=10))
    ts.make_train_step(cfg, opt)   # all-trainable: builds without raising


def test_language_loss_gathered_routes_to_fused(data, monkeypatch):
    monkeypatch.setenv("SIMLINGO_CE_IMPL", "pallas")
    B, Aq = 4, 6
    h2, labels, w = data
    hg = h2.reshape(B, Aq, H)
    lab = labels.reshape(B, Aq)
    valid = jnp.arange(Aq)[None, :] < jnp.array([[6], [3], [0], [5]])[:, 0][:, None]
    out = A.language_loss_gathered(
        hg, lab, valid, lambda h: h @ w.astype(h.dtype).T, head_w=w)
    ce, v = out["language_loss"]
    ref = _ref_ce(h2, labels, w).reshape(B, Aq)
    np.testing.assert_allclose(np.asarray(ce),
                               np.asarray(jnp.where(valid, ref, 0.0)),
                               rtol=2e-5, atol=2e-5)
    assert np.array_equal(np.asarray(v), np.asarray(valid))


def test_scan_path_unchanged(data):
    os.environ.pop("SIMLINGO_CE_IMPL", None)
    B, Aq = 4, 6
    h2, labels, w = data
    hg = h2.reshape(B, Aq, H)
    lab = labels.reshape(B, Aq)
    valid = jnp.ones((B, Aq), bool)
    out = A.language_loss_gathered(
        hg, lab, valid, lambda h: h @ w.astype(h.dtype).T, chunk=3,
        head_w=w)
    ce, _ = out["language_loss"]
    np.testing.assert_allclose(np.asarray(ce),
                               np.asarray(_ref_ce(h2, labels, w)).reshape(B, Aq),
                               rtol=2e-5, atol=2e-5)


def test_pallas_ce_refuses_trainable_embed(monkeypatch):
    """fused_ce returns no dW by design; building a train step with a
    trainable llm/embed under SIMLINGO_CE_IMPL=pallas must fail loudly
    instead of silently dropping the CE-head gradient term."""
    monkeypatch.setenv("SIMLINGO_CE_IMPL", "pallas")
    from simlingo_tpu.core import presets
    from simlingo_tpu.models import simlingo as sm
    from simlingo_tpu.train import train_step as ts

    cfg = presets.small_shardable()
    params = sm.init_params(jax.random.PRNGKey(0), cfg)
    opt = ts.make_optimizer(ts.OptimizerConfig(total_steps=10))
    with pytest.raises(ValueError, match="FROZEN llm/embed"):
        ts.make_train_step(cfg, opt)                      # all trainable
    mask = ts.trainable_mask(params, ts.production_trainable)
    ts.make_train_step(cfg, opt, trainable_mask_tree=mask)  # frozen: builds
