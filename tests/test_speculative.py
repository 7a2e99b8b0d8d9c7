"""Speculative decode: exact parity with greedy decoding regardless of
draft quality, fewer forwards with a good draft, and draft-table mechanics.

The exactness contract is the whole point (infer/speculative.py): drafts
are verified against the model's own argmax, so any draft table -- even an
adversarial one -- must yield token-for-token the greedy output; only the
round count changes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simlingo_tpu.data.synthetic import synthetic_example
from simlingo_tpu.infer import runner, speculative
from simlingo_tpu.models import simlingo
from simlingo_tpu.models.simlingo import SimLingoConfig


def _setup(seed=7, max_new=12, eos=3):
    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    ex = synthetic_example(cfg, batch=1, seq_len=80, num_patches=1,
                           seed=seed, left_pad=True)
    gen_cfg = runner.GenerateConfig(max_new_tokens=max_new, eos_token_id=eos,
                                    cache_dtype=jnp.float32)
    return cfg, params, ex.driving_input, gen_cfg


def _device_tables(tables):
    return {k: jnp.asarray(v) for k, v in tables.items()}


def _greedy(params, di, cfg, gen_cfg):
    return jax.jit(lambda p, d: runner.generate_and_drive(
        p, d, cfg, gen_cfg, compute_dtype=jnp.float32))(params, di)


def _spec(params, di, cfg, gen_cfg, draft, k=4):
    return jax.jit(lambda p, d: speculative.generate_and_drive_spec(
        p, d, cfg, gen_cfg, draft, spec_k=k, compute_dtype=jnp.float32,
        return_stats=True))(params, di)


V_TINY = SimLingoConfig.tiny().llm.vocab_size


@pytest.mark.parametrize("seed,eos", [(7, 3), (11, 3), (7, -1)])
def test_exact_parity_with_garbage_draft(seed, eos):
    """An adversarial (all-wrong) draft still gives the greedy output."""
    cfg, params, di, gen_cfg = _setup(seed=seed, eos=eos)
    rng = np.random.RandomState(0)
    tables = speculative.build_draft_tables(
        [rng.randint(0, V_TINY, size=50).tolist() for _ in range(5)],
        V_TINY)
    out_g = _greedy(params, di, cfg, gen_cfg)
    out_s, stats = _spec(params, di, cfg, gen_cfg, _device_tables(tables))
    np.testing.assert_array_equal(np.asarray(out_s.language_tokens),
                                  np.asarray(out_g.language_tokens))
    np.testing.assert_array_equal(np.asarray(out_s.language_lengths),
                                  np.asarray(out_g.language_lengths))
    np.testing.assert_allclose(np.asarray(out_s.route),
                               np.asarray(out_g.route), atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(out_s.speed_wps),
                               np.asarray(out_g.speed_wps),
                               atol=2e-4, rtol=2e-4)


def test_good_draft_reduces_forwards():
    """Tables built from a previous generation on the same scene (the
    production previous-frame cache: consecutive agent frames produce
    near-identical commentary) accept multi-token chunks: rounds + 1
    forwards << gen_len forwards of plain greedy."""
    cfg, params, di, gen_cfg = _setup(seed=7, max_new=16, eos=-1)
    out_g = _greedy(params, di, cfg, gen_cfg)
    tables = speculative.build_draft_tables(
        [np.asarray(out_g.language_tokens[0]).tolist()], V_TINY)
    out_s, stats = _spec(params, di, cfg, gen_cfg, _device_tables(tables))
    np.testing.assert_array_equal(np.asarray(out_s.language_tokens),
                                  np.asarray(out_g.language_tokens))
    gen_len = int(stats["gen_len"])
    rounds = int(stats["rounds"])
    assert gen_len == 16
    # spec_k=4: a perfect draft needs ceil((16-1)/4)=4 rounds; allow a
    # little slack but require a big win over the 16 greedy forwards
    assert rounds <= 6, (rounds, gen_len)


def test_eos_truncation_parity():
    """Force an early eos: pick the token the greedy path emits at step 2
    as the eos id; spec path must stop at the same length."""
    cfg, params, di, gen_cfg0 = _setup(seed=7, max_new=12, eos=-1)
    out_free = _greedy(params, di, cfg, gen_cfg0)
    eos = int(np.asarray(out_free.language_tokens[0, 2]))
    gen_cfg = runner.GenerateConfig(max_new_tokens=12, eos_token_id=eos,
                                    cache_dtype=jnp.float32)
    out_g = _greedy(params, di, cfg, gen_cfg)
    rng = np.random.RandomState(1)
    tables = speculative.build_draft_tables(
        [rng.randint(0, V_TINY, size=50).tolist() for _ in range(3)], V_TINY)
    out_s, stats = _spec(params, di, cfg, gen_cfg, _device_tables(tables))
    np.testing.assert_array_equal(np.asarray(out_s.language_tokens),
                                  np.asarray(out_g.language_tokens))
    np.testing.assert_array_equal(np.asarray(out_s.language_lengths),
                                  np.asarray(out_g.language_lengths))
    np.testing.assert_allclose(np.asarray(out_s.route),
                               np.asarray(out_g.route), atol=2e-4, rtol=2e-4)


def test_draft_tables_and_propose():
    """Bigram beats unigram where context disambiguates: corpus has
    'a b c' and 'x b y' -- after (a,b) the bigram drafts c, after (x,b)
    drafts y; unigram alone could not separate them."""
    a, b, c, x, y = 5, 6, 7, 8, 9
    seqs = [[a, b, c]] * 3 + [[x, b, y]] * 2
    tables = speculative.build_draft_tables(seqs, 16, table_bits=8)
    dt = _device_tables(tables)
    out_ab = speculative.propose(dt, jnp.asarray([a]), jnp.asarray([b]), 1)
    out_xb = speculative.propose(dt, jnp.asarray([x]), jnp.asarray([b]), 1)
    assert int(out_ab[0, 0]) == c
    assert int(out_xb[0, 0]) == y
    # chain follows the corpus: from (a, b) the 2-chain is [c, <sentinel>]
    chain = speculative.propose(dt, jnp.asarray([a]), jnp.asarray([b]), 2)
    assert int(chain[0, 0]) == c
