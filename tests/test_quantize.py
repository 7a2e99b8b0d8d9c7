"""w8a16 quantized decode path: kernel parity + end-to-end generation."""

import jax
import jax.numpy as jnp
import numpy as np

from simlingo_tpu.core import quantize as Q
from simlingo_tpu.kernels.quantized_matmul import int8_matmul, quantize_weight


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
