"""Inference runner: cached greedy decode must equal the reference's
quadratic no-cache decode (token parity), and the query forward must match."""

import jax
import jax.numpy as jnp
import numpy as np

from simlingo_tpu.data.synthetic import synthetic_example
from simlingo_tpu.infer import runner
from simlingo_tpu.models import adaptors as A
from simlingo_tpu.models import qwen2, simlingo
from simlingo_tpu.models.simlingo import SimLingoConfig


def _naive_reference_decode(params, di, cfg, gen_cfg):
    """Reference-style generation: full re-forward per token, per sample
    (llm.py:178-250), then a full forward with queries appended."""
    label = di.prompt_inference
    B, T = label.ids.shape
    outs = []
    for b in range(B):
        lbl = jax.tree_util.tree_map(lambda x: x[b:b + 1], label)
        pix = di.pixel_values[b:b + 1]
        embeds = simlingo.build_text_embeddings(params, lbl, pix, cfg)
        valid = lbl.valid
        n_valid = int(lbl.num_valid[0])
        toks = []
        for step in range(gen_cfg.max_new_tokens):
            pos = jnp.clip(jnp.cumsum(valid, axis=1) - 1, 0, None).astype(jnp.int32)
            h, _ = qwen2.forward(params["llm"], embeds, cfg.llm, pos,
                                 kv_valid=valid, causal=True)
            logits = qwen2.logits_from_hidden(params["llm"], h[:, -1:], cfg.llm)
            tok = int(jnp.argmax(logits[0, 0]))
            toks.append(tok)
            emb = qwen2.embed_tokens(params["llm"], jnp.asarray([[tok]]))
            embeds = jnp.concatenate([embeds, emb], axis=1)
            valid = jnp.concatenate([valid, jnp.ones((1, 1), bool)], axis=1)
            if tok == gen_cfg.eos_token_id:
                break
        # queries appended, one forward
        queries = A.query_tokens(params["adaptors"], 1)
        embeds = jnp.concatenate([embeds, queries], axis=1)
        valid = jnp.concatenate([valid, jnp.ones((1, queries.shape[1]), bool)],
                                axis=1)
        pos = jnp.clip(jnp.cumsum(valid, axis=1) - 1, 0, None).astype(jnp.int32)
        h, _ = qwen2.forward(params["llm"], embeds, cfg.llm, pos,
                             kv_valid=valid, causal=True)
        preds = A.decode_predictions(params["adaptors"],
                                     h[:, -queries.shape[1]:])
        outs.append((toks, preds))
    return outs


def test_cached_decode_token_parity():
    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    ex = synthetic_example(cfg, batch=2, seq_len=80, num_patches=1,
                           seed=7, left_pad=True)
    di = ex.driving_input
    gen_cfg = runner.GenerateConfig(max_new_tokens=4, eos_token_id=3,
                                    cache_dtype=jnp.float32)

    out = jax.jit(
        lambda p, d: runner.generate_and_drive(p, d, cfg, gen_cfg,
                                               compute_dtype=jnp.float32)
    )(params, di)

    naive = _naive_reference_decode(params, di, cfg, gen_cfg)

    for b, (toks, preds) in enumerate(naive):
        got = np.asarray(out.language_tokens[b])
        n = int(out.language_lengths[b])
        if toks and toks[-1] == gen_cfg.eos_token_id:
            assert n == len(toks), (n, toks)
        np.testing.assert_array_equal(got[:len(toks)], toks)
        # remaining slots are eos padding
        assert (got[len(toks):] == gen_cfg.eos_token_id).all()
        np.testing.assert_allclose(np.asarray(out.route[b]),
                                   np.asarray(preds["route"][0]),
                                   atol=2e-4, rtol=2e-4)
        np.testing.assert_allclose(np.asarray(out.speed_wps[b]),
                                   np.asarray(preds["speed_wps"][0]),
                                   atol=2e-4, rtol=2e-4)


def test_drive_only_matches_training_layout():
    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    ex = synthetic_example(cfg, batch=2, seq_len=80, num_patches=1, seed=3)
    out = jax.jit(
        lambda p, d: runner.drive_only(p, d, cfg, compute_dtype=jnp.float32)
    )(params, ex.driving_input)
    assert out.route.shape == (2, 20, 2)
    assert np.isfinite(np.asarray(out.route)).all()


def test_sampling_options():
    import jax
    from simlingo_tpu.infer.runner import GenerateConfig, sample_categorical

    logits = jnp.asarray([[1.0, 5.0, 3.0, 0.0, -2.0]])
    rng = jax.random.PRNGKey(0)
    pick = lambda r, c: int(sample_categorical(r, logits, c)[0])
    # greedy
    assert pick(rng, GenerateConfig()) == 1
    # restriction excludes the argmax
    assert pick(rng, GenerateConfig(restrict_tokens=(2, 2))) in (2, 3)
    # top-k=1 == greedy even with temperature
    assert pick(rng, GenerateConfig(temperature=1.0, top_k=1)) == 1
    # top-p tiny keeps only the max
    assert pick(rng, GenerateConfig(temperature=1.0, top_p=1e-6)) == 1
    # temperature sampling covers several tokens
    cfg = GenerateConfig(temperature=2.0)
    draws = {pick(jax.random.PRNGKey(i), cfg) for i in range(50)}
    assert len(draws) > 1


def test_generation_with_lora():
    """Decode path applies LoRA adapters (and merging gives same tokens)."""
    import dataclasses
    cfg0 = SimLingoConfig.tiny()
    llm = dataclasses.replace(cfg0.llm, lora_r=4, lora_alpha=8)
    cfg = dataclasses.replace(cfg0, llm=llm)
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    # nonzero B so LoRA changes outputs
    params["lora"] = jax.tree_util.tree_map(
        lambda x: x + 0.02 if x.ndim == 2 else x, params["lora"])
    ex = synthetic_example(cfg, batch=1, seq_len=80, num_patches=1,
                           seed=5, left_pad=True)
    gen_cfg = runner.GenerateConfig(max_new_tokens=4, eos_token_id=3,
                                    cache_dtype=jnp.float32)
    out_lora = runner.generate_and_drive(params, ex.driving_input, cfg,
                                         gen_cfg, compute_dtype=jnp.float32)
    # merged weights, no lora tree
    merged = dict(params)
    merged["llm"] = qwen2.merge_lora(params["llm"], merged.pop("lora"),
                                     cfg.llm)
    out_merged = runner.generate_and_drive(merged, ex.driving_input, cfg,
                                           gen_cfg, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(out_lora.language_tokens),
                                  np.asarray(out_merged.language_tokens))
    # and differs from the no-lora model
    base = {k: v for k, v in params.items() if k != "lora"}
    out_base = runner.generate_and_drive(base, ex.driving_input, cfg,
                                         gen_cfg, compute_dtype=jnp.float32)
    assert not np.allclose(np.asarray(out_lora.route),
                           np.asarray(out_base.route))
