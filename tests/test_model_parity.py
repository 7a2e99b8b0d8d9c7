"""Parity tests: our JAX towers vs transformers' torch implementations.

Random-initialized torch models are converted via core.hf_convert and must
produce matching outputs -- this validates both the architectures and the
converter (the path a real InternVL2-1B / RenzKa-simlingo checkpoint takes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from simlingo_tpu.core import hf_convert
from simlingo_tpu.models import qwen2, vit


def _small_qwen_cfgs():
    from transformers import Qwen2Config as HFQwen2Config
    hf = HFQwen2Config(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=True, attention_dropout=0.0,
    )
    ours = qwen2.Qwen2Config(
        vocab_size=512, hidden_size=64, num_layers=2, num_heads=4,
        num_kv_heads=2, head_dim=16, intermediate_size=128,
        rope_theta=10000.0, tie_word_embeddings=True)
    return hf, ours


def test_qwen2_parity():
    from transformers import Qwen2Model
    hf_cfg, cfg = _small_qwen_cfgs()
    torch.manual_seed(0)
    model = Qwen2Model(hf_cfg).eval()

    params = hf_convert.qwen2_from_torch(model.state_dict(), cfg)

    B, T = 2, 24
    rng = np.random.RandomState(0)
    embeds = rng.randn(B, T, 64).astype(np.float32) * 0.1
    pos = np.tile(np.arange(T, dtype=np.int32), (B, 1))
    mask = np.ones((B, T), dtype=np.int64)
    mask[0, -5:] = 0  # right padding on sample 0

    with torch.no_grad():
        out_t = model(inputs_embeds=torch.tensor(embeds),
                      attention_mask=torch.tensor(mask),
                      position_ids=torch.tensor(pos.astype(np.int64)),
                      ).last_hidden_state.numpy()

    out_j, _ = qwen2.forward(params, jnp.asarray(embeds), cfg,
                             jnp.asarray(pos), jnp.asarray(mask != 0))
    out_j = np.asarray(out_j)
    # compare only valid positions
    valid = mask.astype(bool)
    np.testing.assert_allclose(out_j[valid], out_t[valid], atol=2e-4, rtol=2e-4)


def test_qwen2_logits_tied():
    from transformers import Qwen2Model
    hf_cfg, cfg = _small_qwen_cfgs()
    torch.manual_seed(1)
    model = Qwen2Model(hf_cfg).eval()
    params = hf_convert.qwen2_from_torch(model.state_dict(), cfg)
    hidden = jnp.asarray(np.random.RandomState(1).randn(1, 3, 64).astype(np.float32))
    logits = qwen2.logits_from_hidden(params, hidden, cfg)
    expected = np.asarray(hidden) @ np.asarray(params["embed"]["w"]).T
    np.testing.assert_allclose(np.asarray(logits), expected, atol=1e-5)


def test_vit_parity():
    from transformers import InternVLVisionConfig, InternVLVisionModel
    hf_cfg = InternVLVisionConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=[56, 56], patch_size=[14, 14],
        attention_bias=True, layer_scale_init_value=0.1,
        hidden_dropout_prob=0.0, attention_dropout=0.0, projection_dropout=0.0,
    )
    cfg = vit.ViTConfig(hidden_size=64, num_layers=2, num_heads=4,
                        intermediate_size=128, image_size=56, patch_size=14,
                        qkv_bias=True)
    torch.manual_seed(0)
    model = InternVLVisionModel(hf_cfg).eval()
    # give cls/pos embeddings nonzero values so the test is meaningful
    with torch.no_grad():
        model.embeddings.cls_token.normal_(0, 0.02)
        model.embeddings.position_embeddings.normal_(0, 0.02)

    params = hf_convert.vit_from_torch_native(model.state_dict(), cfg)

    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        out_t = model(pixel_values=torch.tensor(img)).last_hidden_state.numpy()

    out_j = vit.encode(params, jnp.asarray(img.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(out_j), out_t, atol=2e-4, rtol=2e-4)


def test_pixel_shuffle_matches_hf():
    """Our pixel_shuffle vs the HF InternVLModel implementation."""
    import transformers.models.internvl.modeling_internvl as m

    class Dummy:
        pixel_shuffle = m.InternVLModel.pixel_shuffle

    x = np.random.RandomState(0).randn(2, 8, 8, 64).astype(np.float32)
    ref = Dummy.pixel_shuffle(Dummy(), torch.tensor(x), scale_factor=0.5).numpy()
    ours = np.asarray(vit.pixel_shuffle(jnp.asarray(x), 0.5))
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_qwen2_kv_cache_decode_matches_full_forward():
    """Prefill + cached single-token decode == full re-forward (greedy path)."""
    cfg = qwen2.Qwen2Config.tiny()
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    B, T_prefill, max_len = 2, 8, 16
    embeds = jax.random.normal(jax.random.PRNGKey(1), (B, max_len, cfg.hidden_size)) * 0.1
    pos_full = jnp.tile(jnp.arange(max_len, dtype=jnp.int32), (B, 1))

    # full forward over 10 tokens
    T_total = 10
    full, _ = qwen2.forward(params, embeds[:, :T_total], cfg, pos_full[:, :T_total])

    # prefill 8 tokens (q_offset = 0 handled internally via cache index)
    cache = qwen2.init_cache(cfg, B, max_len, dtype=jnp.float32)
    pre, cache = qwen2.forward(
        params, embeds[:, :T_prefill], cfg, pos_full[:, :T_prefill],
        kv_valid=jnp.tile(jnp.arange(max_len)[None, :] < T_prefill, (B, 1)),
        causal=True, cache=cache)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :T_prefill]),
                               atol=2e-5, rtol=2e-5)

    # decode tokens 8 and 9 one at a time
    for t in range(T_prefill, T_total):
        cache = dict(cache, index=jnp.asarray(t, jnp.int32))
        step, cache = qwen2.forward(
            params, embeds[:, t:t + 1], cfg, pos_full[:, t:t + 1],
            kv_valid=jnp.tile(jnp.arange(max_len)[None, :] <= t, (B, 1)),
            causal=True, cache=cache)
        np.testing.assert_allclose(np.asarray(step[:, 0]), np.asarray(full[:, t]),
                                   atol=2e-5, rtol=2e-5)


def test_lora_merge_equals_runtime_lora():
    cfg = qwen2.Qwen2Config.tiny()
    cfg = __import__("dataclasses").replace(cfg, lora_r=4, lora_alpha=8)
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg)
    lora = qwen2.init_lora_params(jax.random.PRNGKey(1), cfg)
    # give B nonzero values so the adapters actually do something
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 if x.ndim == 2 else x, lora)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, cfg.hidden_size)) * 0.1
    pos = jnp.tile(jnp.arange(8, dtype=jnp.int32), (2, 1))
    with_lora, _ = qwen2.forward(params, x, cfg, pos, lora_params=lora)
    merged = qwen2.merge_lora(params, lora, cfg)
    with_merged, _ = qwen2.forward(merged, x, cfg, pos)
    np.testing.assert_allclose(np.asarray(with_lora), np.asarray(with_merged),
                               atol=2e-5, rtol=2e-5)
    # base params untouched
    without, _ = qwen2.forward(params, x, cfg, pos)
    assert np.abs(np.asarray(without) - np.asarray(with_lora)).max() > 1e-6
