"""Ring-attention sequence parallelism on the 8-device virtual CPU mesh.

Pins numeric parity (fwd + grads) of parallel/sequence.py against the XLA
reference attention, the dispatch rules in kernels.flash_attention.attention,
and full-train-step parity sp=2 vs unsharded (the same inertness bar the tp
axis is held to in test_train_step.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simlingo_tpu.kernels.flash_attention import attention, attention_reference
from simlingo_tpu.parallel import mesh as meshlib
from simlingo_tpu.parallel import sequence as sq


def _rand_qkv(key, B=2, T=64, HQ=4, HK=2, D=16):
    kq, kk, kv, kval = jax.random.split(key, 4)
    q = jax.random.normal(kq, (B, T, HQ, D), jnp.float32)
    k = jax.random.normal(kk, (B, T, HK, D), jnp.float32)
    v = jax.random.normal(kv, (B, T, HK, D), jnp.float32)
    # right-padded batch: row 0 full, row 1 keeps 3/4 of the sequence
    valid = jnp.arange(T)[None, :] < jnp.array([[T], [3 * T // 4]])
    return q, k, v, valid


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("sp", [2, 4])
def test_ring_matches_reference(causal, sp):
    mesh = meshlib.make_mesh(dp=8 // sp, sp=sp)
    q, k, v, valid = _rand_qkv(jax.random.PRNGKey(0))
    ref = attention_reference(q, k, v, valid, causal=causal)
    out = jax.jit(lambda *a: sq.ring_attention(
        *a, causal=causal, mesh=mesh, axis="sp"))(q, k, v, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_ring_grads_match_reference():
    mesh = meshlib.make_mesh(dp=2, sp=4)
    q, k, v, valid = _rand_qkv(jax.random.PRNGKey(1))
    w = jax.random.normal(jax.random.PRNGKey(2), q.shape, jnp.float32)

    def loss(fn):
        def f(q_, k_, v_):
            return (fn(q_, k_, v_) * w).sum()
        return jax.jit(jax.grad(f, argnums=(0, 1, 2)))

    g_ref = loss(lambda *a: attention_reference(*a, valid, causal=True))(
        q, k, v)
    g_ring = loss(lambda *a: sq.ring_attention(
        *a, valid, causal=True, mesh=mesh, axis="sp"))(q, k, v)
    for name, a, b in zip("qkv", g_ref, g_ring):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-5, rtol=1e-4, err_msg=name)


def test_dispatch_routes_and_falls_back():
    """attention() takes the ring path only for eligible shapes."""
    mesh = meshlib.make_mesh(dp=4, sp=2)
    q, k, v, valid = _rand_qkv(jax.random.PRNGKey(3))
    ref = attention_reference(q, k, v, valid, causal=True)
    with sq.sequence_parallel(mesh):
        assert sq.active_axis() is not None
        out = jax.jit(lambda *a: attention(*a, causal=True))(q, k, v, valid)
        # odd sequence length: must fall back to the single-chip path
        qo, ko, vo = q[:, :63], k[:, :63], v[:, :63]
        out_odd = jax.jit(lambda *a: attention(*a, None, causal=True))(
            qo, ko, vo)
        # KV-cached call (q_offset set): never ring-routed
        out_dec = attention(q[:, -1:], k, v, valid, causal=True,
                            q_offset=jnp.int32(63))
    assert sq.active_axis() is None          # context restored
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_odd),
        np.asarray(attention_reference(qo, ko, vo, None, causal=True)),
        atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out_dec),
        np.asarray(attention_reference(q[:, -1:], k, v, valid, causal=True,
                                       q_offset=jnp.int32(63))),
        atol=2e-5)


def test_train_step_sp2_matches_unsharded():
    """The sp axis must be numerically inert on the full model: loss AND
    grads agree between an unsharded run and an sp=2 run (mirrors the tp
    bar in test_train_step.py)."""
    from simlingo_tpu.data.synthetic import synthetic_example
    from simlingo_tpu.models import simlingo
    from simlingo_tpu.models.simlingo import SimLingoConfig

    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    ex = synthetic_example(cfg, batch=2, seq_len=96, num_patches=1)

    def loss_and_grads(p, batch):
        def loss_fn(p_, b_):
            out, _ = simlingo.forward_loss(p_, b_, cfg,
                                           compute_dtype=jnp.float32)
            return out.loss
        return jax.jit(jax.value_and_grad(loss_fn))(p, batch)

    l1, g1 = loss_and_grads(params, ex)

    mesh = meshlib.make_mesh(dp=1, fsdp=1, tp=1, sp=2,
                             devices=jax.devices()[:2])
    with sq.sequence_parallel(mesh):
        l2, g2 = loss_and_grads(params, ex)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for name, leaf1, leaf2 in [
        ("llm_q_w", g1["llm"]["layers"]["0"]["attn"]["q"]["w"],
         g2["llm"]["layers"]["0"]["attn"]["q"]["w"]),
        ("llm_v_w", g1["llm"]["layers"]["0"]["attn"]["v"]["w"],
         g2["llm"]["layers"]["0"]["attn"]["v"]["w"]),
        ("route_queries", g1["adaptors"]["route_queries"],
         g2["adaptors"]["route_queries"]),
    ]:
        a, b = np.asarray(leaf1), np.asarray(jax.device_get(leaf2))
        denom = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-5,
                                   err_msg=name)


def test_trainer_raises_when_sp_never_engages(tmp_path):
    """sp configured but no attention call eligible (indivisible sequence):
    the trainer must fail loudly instead of silently training replicated."""
    import dataclasses

    from simlingo_tpu.core.config import compose
    from simlingo_tpu.data.tokenizer import SimLingoTokenizer
    from simlingo_tpu.models.qwen2 import Qwen2Config
    from simlingo_tpu.models.simlingo import SimLingoConfig
    from simlingo_tpu.models.vit import ViTConfig
    from simlingo_tpu.train import trainer

    tok = SimLingoTokenizer()
    cfg = compose(overrides=[
        "max_steps=1", "name=spfail", "log_every_n_steps=0",
        "checkpoint_every_n_steps=0", "visualise_every_n_steps=0",
        "precision=f32", "mesh.dp=4", "mesh.fsdp=1", "mesh.tp=1",
        "mesh.sp=2"])
    object.__setattr__(cfg, "model", SimLingoConfig(
        vit=ViTConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=56, patch_size=14,
                      projector_out=32),
        llm=Qwen2Config(vocab_size=tok.tk.vocab_size + 8, hidden_size=32,
                        num_layers=1, num_heads=2, num_kv_heads=1,
                        head_dim=16, intermediate_size=64),
        img_context_token_id=tok.img_context_id,
        remat_vision=False, remat_llm=False, max_answer_len=64))
    object.__setattr__(cfg, "output_dir", str(tmp_path))
    object.__setattr__(cfg.data, "batch_size", 4)
    # odd max_text_len => LLM sequence length never divides sp=2
    object.__setattr__(cfg.data, "max_text_len", 97)
    with pytest.raises(RuntimeError, match="ring-routed"):
        trainer.train(cfg, make_synthetic=True)
    assert sq.active_axis() is None      # context cleaned up on the raise


def test_enable_noop_on_sp1_mesh():
    mesh = meshlib.make_mesh(dp=8)           # sp axis of size 1
    sq.enable(mesh)
    assert sq.active_axis() is None
    sq.disable()
