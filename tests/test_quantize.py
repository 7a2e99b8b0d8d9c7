"""w8a16 / w4a16 quantized decode paths: kernel parity + e2e generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simlingo_tpu.core import quantize as Q
from simlingo_tpu.kernels.quantized_matmul import (dequantize_weight4,
                                                   int4_matmul, int8_matmul,
                                                   quantize_weight,
                                                   quantize_weight4)


def test_int8_matmul_close_to_fp():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(3, 5, 96).astype(np.float32))
    w = jnp.asarray(rng.randn(96, 200).astype(np.float32) * 0.05)
    w_q, scale = quantize_weight(w, axis=1)
    y = int8_matmul(x, w_q, scale, block_n=128)
    ref = x @ w
    err = np.abs(np.asarray(y - ref)) / (np.abs(np.asarray(ref)).mean() + 1e-6)
    assert err.mean() < 0.02, err.mean()


def test_int8_matmul_transpose_rhs():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(4, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(300, 64).astype(np.float32) * 0.1)  # [N, K]
    w_q, scale = quantize_weight(w, axis=0)                       # per-row
    y = int8_matmul(x, w_q, scale, transpose_rhs=True, block_n=128)
    ref = x @ w.T
    err = np.abs(np.asarray(y - ref)) / (np.abs(np.asarray(ref)).mean() + 1e-6)
    assert err.mean() < 0.02, err.mean()


# ---------------------------------------------------------------------------
# w4a16 (group-wise int4)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("M", [1, 6, 200])   # decode vs dense-fallback branch
def test_int4_matmul_exact_vs_dequantized(M):
    """int4_matmul must equal x @ dequantize(w_q, scale) EXACTLY up to fp
    accumulation order -- the quantization error lives in quantize_weight4,
    not the matmul."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, 96).astype(np.float32))
    w = jnp.asarray(rng.randn(96, 160).astype(np.float32) * 0.05)
    w_q, scale = quantize_weight4(w, axis=1, group=32)
    # nibble-packed storage: int8 bytes, half the reduction extent
    assert w_q.dtype == jnp.int8 and w_q.shape == (48, 160)
    assert scale.shape == (3, 160)
    y = int4_matmul(x, w_q, scale)
    ref = x @ dequantize_weight4(w_q, scale, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)
    # and close to the fp matmul (group scales bound the quant error; ~15
    # levels per group => a few percent relative noise on gaussian weights)
    rel = np.abs(np.asarray(y - x @ w)) / (np.abs(np.asarray(x @ w)).mean()
                                           + 1e-6)
    assert rel.mean() < 0.15, rel.mean()


@pytest.mark.parametrize("M", [1, 200])
def test_int4_matmul_transpose_rhs(M):
    """Tied-LM-head orientation: w [V, H], per-row group scales [V, G]."""
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(M, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(300, 64).astype(np.float32) * 0.1)   # [V, H]
    w_q, scale = quantize_weight4(w, axis=0, group=32)
    assert scale.shape == (300, 2)
    y = int4_matmul(x, w_q, scale, transpose_rhs=True)
    ref = x @ dequantize_weight4(w_q, scale, transpose_rhs=True,
                                 dtype=jnp.float32).T
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("transpose_rhs", [False, True])
@pytest.mark.parametrize("M", [4, 200])
def test_int4_matmul_grad_is_dequantized_dense_grad(transpose_rhs, M):
    """dx through int4_matmul == dx through the dequantized dense matmul
    (activation-only VJP; the weights are frozen serving weights)."""
    rng = np.random.RandomState(2)
    K = 64
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    if transpose_rhs:
        w = jnp.asarray(rng.randn(120, K).astype(np.float32) * 0.1)
        w_q, scale = quantize_weight4(w, axis=0, group=32)
        dense = dequantize_weight4(w_q, scale, True, jnp.float32).T
    else:
        w = jnp.asarray(rng.randn(K, 120).astype(np.float32) * 0.1)
        w_q, scale = quantize_weight4(w, axis=1, group=32)
        dense = dequantize_weight4(w_q, scale, False, jnp.float32)
    cot = jnp.asarray(rng.randn(M, 120).astype(np.float32))
    g_q = jax.grad(lambda x_: (int4_matmul(
        x_, w_q, scale, transpose_rhs) * cot).sum())(x)
    g_d = jax.grad(lambda x_: ((x_ @ dense) * cot).sum())(x)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(g_d),
                               atol=2e-4, rtol=1e-4)


def test_int4_group_scales_beat_per_channel():
    """The point of group-wise scales: a weight matrix with per-group
    magnitude structure quantizes much tighter than per-channel int4 would."""
    rng = np.random.RandomState(3)
    w = rng.randn(128, 64).astype(np.float32)
    w[:32] *= 20.0                       # one loud group per column
    w_q, scale = quantize_weight4(jnp.asarray(w), axis=1, group=32)
    err_group = np.abs(np.asarray(dequantize_weight4(
        w_q, scale, dtype=jnp.float32)) - w)
    # per-channel int4: one scale per column over all 128 rows
    sc_pc = np.abs(w).max(0) / 7.0
    w_pc = np.clip(np.round(w / sc_pc), -7, 7) * sc_pc
    err_pc = np.abs(w_pc - w)
    assert err_group[32:].mean() < 0.25 * err_pc[32:].mean()


def test_int4_embedding_gather_matches_dequantized():
    from simlingo_tpu.models import layers as L

    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(50, 64).astype(np.float32) * 0.3)
    p = Q.quantize_embedding({"w": w}, bits=4, group=32)
    ids = jnp.asarray([[0, 7, 49], [3, 3, 12]])
    rows = L.embed(p, ids, dtype=jnp.float32)
    ref = jnp.take(dequantize_weight4(p["w_q"], p["scale"], True,
                                      jnp.float32), ids, axis=0)
    np.testing.assert_allclose(np.asarray(rows), np.asarray(ref),
                               atol=1e-5)


def test_int4_generation_close_to_bf16():
    """End-to-end w4a16 serving on the tiny model: decode runs, tokens
    mostly agree with fp, waypoints stay close (same bar shape as the int8
    test below, slightly looser -- int4 is opt-in pending real-checkpoint
    validation)."""
    from simlingo_tpu.data.synthetic import synthetic_example
    from simlingo_tpu.infer import runner
    from simlingo_tpu.models import simlingo
    from simlingo_tpu.models.simlingo import SimLingoConfig

    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    ex = synthetic_example(cfg, batch=2, seq_len=64, num_patches=1,
                           left_pad=True)
    gen_cfg = runner.GenerateConfig(max_new_tokens=8, eos_token_id=-1)

    out_fp = runner.generate_and_drive(params, ex.driving_input, cfg, gen_cfg)
    qparams = Q.quantize_for_inference(params, cfg.llm, bits=4, group=16)
    q0 = qparams["llm"]["layers"]["0"]["attn"]["q"]
    assert q0["w_q"].dtype == jnp.int8 and q0["scale"].ndim == 2  # packed
    out_q = runner.generate_and_drive(qparams, ex.driving_input, cfg, gen_cfg)

    match = (np.asarray(out_fp.language_tokens)
             == np.asarray(out_q.language_tokens)).mean()
    assert match >= 0.6, match
    np.testing.assert_allclose(np.asarray(out_q.speed_wps),
                               np.asarray(out_fp.speed_wps), atol=0.6)


def test_quantized_generation_matches_bf16_tokens():
    """Greedy tokens from the int8 LLM must match the fp LLM on a tiny model
    (loose requirement: argmax is robust to ~1% weight error)."""
    from simlingo_tpu.core.structs import DrivingExample
    from simlingo_tpu.data.synthetic import synthetic_example
    from simlingo_tpu.infer import runner
    from simlingo_tpu.models import simlingo
    from simlingo_tpu.models.simlingo import SimLingoConfig

    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    ex = synthetic_example(cfg, batch=2, seq_len=64, num_patches=1,
                           left_pad=True)
    gen_cfg = runner.GenerateConfig(max_new_tokens=8, eos_token_id=-1)

    out_fp = runner.generate_and_drive(params, ex.driving_input, cfg, gen_cfg)
    qparams = Q.quantize_for_inference(params, cfg.llm)
    assert "w_q" in qparams["llm"]["layers"]["0"]["attn"]["q"]
    out_q = runner.generate_and_drive(qparams, ex.driving_input, cfg, gen_cfg)

    match = (np.asarray(out_fp.language_tokens)
             == np.asarray(out_q.language_tokens)).mean()
    assert match >= 0.75, match
    # waypoints close (adaptors are fp; only LLM hidden states differ)
    np.testing.assert_allclose(np.asarray(out_q.speed_wps),
                               np.asarray(out_fp.speed_wps), atol=0.35)
