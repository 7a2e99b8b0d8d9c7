"""Speculative CoT decoding: n-gram draft + exact greedy verification.

The production agent's CoT commentary (reference agent_simlingo.py:628-631)
is template-generated text (labels/commentary.py) with a small phrase
inventory, so a bigram/unigram n-gram cache predicts the next token well.
Each speculation round forwards the pending token plus k-1 draft tokens
through the KV-cached LLM in ONE chunked forward: at decode batch the step
is HBM-bound on the weight read, so a k-token chunk costs the same wall
time as a 1-token step but can emit up to k accepted tokens. Verification
is exact: a draft token is kept only if it equals the model's own greedy
argmax at that position, so the emitted sequence is token-for-token
identical to plain greedy decoding (tests/test_speculative.py asserts it);
acceptance rate only changes HOW FAST the same text appears.

The reference has no KV cache at all (llm.py:217-235 re-forwards the whole
prefix per token); this module is a second-order latency lever on top of
the cached decode in infer/runner.py.

TPU-first details: the draft tables are dense device arrays (a direct-
mapped uint32-hashed bigram table + a unigram fallback), the chain lookup
is k-1 static gathers, and the whole decode is one `lax.while_loop` with
static shapes -- no host round trips per round.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from simlingo_tpu.core.structs import DrivingInput, DrivingOutput
from simlingo_tpu.infer.runner import GenerateConfig, sample_categorical
from simlingo_tpu.models import adaptors as A
from simlingo_tpu.models import qwen2, simlingo
from simlingo_tpu.models.simlingo import SimLingoConfig

_HASH_MULT = np.uint32(2654435761)     # Knuth multiplicative hash


def _bigram_hash(prev, cur, mask):
    """Identical arithmetic host (numpy) and device (jnp): uint32 wrap."""
    p = prev.astype(jnp.uint32) if isinstance(prev, jnp.ndarray) else \
        np.asarray(prev, np.uint32)
    c = cur.astype(jnp.uint32) if isinstance(cur, jnp.ndarray) else \
        np.asarray(cur, np.uint32)
    return ((p * _HASH_MULT) ^ c) & mask


def build_draft_tables(seqs: Sequence[Sequence[int]], vocab_size: int,
                       table_bits: int = 15) -> Dict[str, np.ndarray]:
    """Order-2 + order-1 next-token tables from a token corpus.

    bigram: direct-mapped table of 2**table_bits slots keyed by
    hash(prev, cur); on collision the higher-count context wins.
    unigram: most frequent next token per current token (fallback).
    Unfilled slots draft `vocab_size - 1` (an unlikely id: a wrong draft
    merely costs acceptance, never correctness).
    """
    from collections import Counter, defaultdict

    M = 1 << table_bits
    mask = np.uint32(M - 1)
    bi_counts: Dict[tuple, Counter] = defaultdict(Counter)
    uni_counts: Dict[int, Counter] = defaultdict(Counter)
    for seq in seqs:
        for i in range(len(seq) - 1):
            uni_counts[seq[i]][seq[i + 1]] += 1
            if i >= 1:
                bi_counts[(seq[i - 1], seq[i])][seq[i + 1]] += 1

    sentinel = vocab_size - 1
    uni = np.full((vocab_size,), sentinel, np.int32)
    for cur, ctr in uni_counts.items():
        if 0 <= cur < vocab_size:
            uni[cur] = ctr.most_common(1)[0][0]

    bi_prev = np.full((M,), -1, np.int32)
    bi_cur = np.full((M,), -1, np.int32)
    bi_next = np.full((M,), sentinel, np.int32)
    # insert in increasing total count so the most frequent context wins
    # its slot on collision
    for (prev, cur), ctr in sorted(bi_counts.items(),
                                   key=lambda kv: sum(kv[1].values())):
        h = int(_bigram_hash(np.int32(prev), np.int32(cur), mask))
        bi_prev[h], bi_cur[h] = prev, cur
        bi_next[h] = ctr.most_common(1)[0][0]
    return {"uni": uni, "bi_prev": bi_prev, "bi_cur": bi_cur,
            "bi_next": bi_next}


def propose(draft: Dict[str, jnp.ndarray], prev: jnp.ndarray,
            cur: jnp.ndarray, n: int) -> jnp.ndarray:
    """Chain n draft tokens from context (prev, cur). [B] -> [B, n]."""
    mask = jnp.uint32(draft["bi_prev"].shape[0] - 1)
    out = []
    for _ in range(n):
        h = _bigram_hash(prev, cur, mask).astype(jnp.int32)
        hit = (draft["bi_prev"][h] == prev) & (draft["bi_cur"][h] == cur)
        nxt = jnp.where(hit, draft["bi_next"][h], draft["uni"][cur])
        out.append(nxt)
        prev, cur = cur, nxt
    return jnp.stack(out, axis=1)


def generate_and_drive_spec(params: Dict[str, Any], di: DrivingInput,
                            model_cfg: SimLingoConfig,
                            gen_cfg: GenerateConfig,
                            draft: Dict[str, jnp.ndarray],
                            spec_k: int = 4,
                            compute_dtype=jnp.bfloat16,
                            return_stats: bool = False) -> DrivingOutput:
    """Speculative counterpart of runner.generate_and_drive (greedy, B=1).

    Output is bit-identical to the plain greedy path; only the number of
    LLM forwards changes. spec_k = chunk size per round (pending token +
    spec_k-1 drafts), so a round emits 1..spec_k tokens.

    return_stats=True additionally returns {"rounds", "gen_len"}: a plain
    greedy decode runs gen_len single-token forwards, the speculative one
    runs rounds k-token chunk forwards (each ~the cost of a 1-token step:
    decode is HBM-bound on the weight read) + 1 flush forward, so the
    equivalent tokens-per-forward = gen_len / (rounds + 1).
    """
    cfg = model_cfg
    label = di.prompt_inference
    B, T_prompt = label.ids.shape
    assert B == 1, "speculative decode serves the closed-loop agent (B=1)"
    assert gen_cfg.temperature <= 0.0, "speculative decode is greedy-only"
    n_query = cfg.num_queries
    max_new = gen_cfg.max_new_tokens
    k = max(2, min(spec_k, max_new))
    max_len = T_prompt + max_new + n_query
    eos = gen_cfg.eos_token_id

    # ---- prefill (identical to runner.generate_and_drive) ----
    embeds = simlingo.build_text_embeddings(params, label, di.pixel_values,
                                            cfg, dtype=compute_dtype)
    n_valid = label.num_valid                                    # [B]
    text_pos = jnp.clip(jnp.cumsum(label.valid, axis=1) - 1, 0, None
                        ).astype(jnp.int32)
    kv_valid = jnp.pad(label.valid, ((0, 0), (0, max_new + n_query)))
    cache = qwen2.init_cache(cfg.llm, B, max_len, dtype=gen_cfg.cache_dtype)
    hidden, cache = qwen2.forward(
        params["llm"], embeds, cfg.llm, text_pos,
        kv_valid=kv_valid, causal=True,
        lora_params=params.get("lora"), cache=cache)
    last_hidden = hidden[:, -1].astype(compute_dtype)

    def greedy_of(logits):
        return sample_categorical(jax.random.PRNGKey(0),
                                  logits.astype(jnp.float32), gen_cfg)

    # first token comes straight from the prefill hidden (same as the
    # greedy path's first body iteration)
    t0 = greedy_of(qwen2.logits_from_hidden(params["llm"], last_hidden,
                                            cfg.llm))                # [B]
    tokens = jnp.full((B, max_new), eos, jnp.int32).at[:, 0].set(t0)
    # prev context for the draft chain = last real prompt token
    # (left-padded prompts end at T_prompt - 1)
    prev0 = label.ids[:, -1].astype(jnp.int32)
    slot_range = jnp.arange(max_len)[None, :]
    idx_k = jnp.arange(k)

    def cond(carry):
        m, done = carry[0], carry[1]
        return (m < max_new) & ~done.all()

    def body(carry):
        m, done, tokens, pending, prev, kv_valid, cache, rounds, accepted \
            = carry
        drafts = propose(draft, prev, pending, k - 1)            # [B, k-1]
        chunk = jnp.concatenate([pending[:, None], drafts], axis=1)
        s = T_prompt + m - 1                      # slot of the pending token
        kv_tmp = kv_valid | ((slot_range >= s) & (slot_range < s + k))
        emb = qwen2.embed_tokens(params["llm"], chunk, dtype=compute_dtype)
        pos = (n_valid[:, None] + (m - 1) + idx_k[None, :]).astype(jnp.int32)
        cache2 = dict(cache, index=jnp.asarray(s, jnp.int32))
        h, cache2 = qwen2.forward(
            params["llm"], emb, cfg.llm, pos,
            kv_valid=kv_tmp, causal=True,
            lora_params=params.get("lora"), cache=cache2)
        logits = qwen2.logits_from_hidden(
            params["llm"], h.astype(compute_dtype), cfg.llm)     # [B, k, V]
        true_next = greedy_of(logits)                            # [B, k]

        # accepted draft prefix: drafts[i] must equal the model's token at
        # the same position (true_next[i] follows chunk[i])
        match = (drafts == true_next[:, :k - 1])
        acc = jnp.cumprod(match.astype(jnp.int32), axis=1).sum(axis=1)  # [B]
        # emit c tokens: accepted drafts + the model's correction; truncate
        # at the first emitted eos and at the budget
        c = acc + 1
        is_eos = true_next == eos
        eos_pos = jnp.min(jnp.where(is_eos, idx_k[None, :], k), axis=1)
        c = jnp.minimum(c, eos_pos + 1)
        c = jnp.minimum(c, max_new - m)
        c = jnp.where(done, 0, c)

        emit_mask = idx_k[None, :] < c[:, None]                   # [B, k]
        # non-emitted lanes scatter to an out-of-bounds index and are
        # dropped (a clipped duplicate index would race the real write)
        write_idx = jnp.where(emit_mask[0], m + idx_k, max_new)   # [k]
        tokens = tokens.at[0, write_idx].set(true_next[0], mode="drop")

        # pending + accepted drafts now have correct KV in slots [s, s+c)
        kv_valid = kv_valid | (
            (slot_range >= s) & (slot_range < s + c[:, None]) & ~done[:, None])
        new_pending = jnp.where(
            c[0] > 0, true_next[0, jnp.clip(c[0] - 1, 0, k - 1)], pending[0]
        )[None]
        new_prev = jnp.where(
            c[0] >= 2, true_next[0, jnp.clip(c[0] - 2, 0, k - 1)], pending[0]
        )[None]
        done = done | ((is_eos & emit_mask).any(axis=1))
        return (m + c[0], done, tokens, new_pending.astype(jnp.int32),
                new_prev.astype(jnp.int32), kv_valid, cache2,
                rounds + 1, accepted + c[0])

    done0 = (t0 == eos)
    carry = (jnp.ones((), jnp.int32), done0, tokens, t0.astype(jnp.int32),
             prev0, kv_valid, cache, jnp.zeros((), jnp.int32),
             jnp.ones((), jnp.int32))
    m, done, tokens, pending, _, kv_valid, cache, rounds, _ = \
        jax.lax.while_loop(cond, body, carry)

    # flush: the last emitted token's KV is not in the cache yet (each round
    # forwards the PREVIOUS pending); one 1-token forward puts it there so
    # the driving-query forward sees exactly the greedy path's cache state
    s_f = T_prompt + m - 1
    kv_valid = kv_valid | (slot_range == s_f)
    emb_f = qwen2.embed_tokens(params["llm"], pending[:, None],
                               dtype=compute_dtype)
    pos_f = (n_valid + m - 1)[:, None].astype(jnp.int32)
    cache = dict(cache, index=jnp.asarray(s_f, jnp.int32))
    _, cache = qwen2.forward(
        params["llm"], emb_f, cfg.llm, pos_f,
        kv_valid=kv_valid, causal=True,
        lora_params=params.get("lora"), cache=cache)

    gen_len = m * jnp.ones((B,), jnp.int32)

    # ---- driving-query forward (identical to the greedy path) ----
    queries = A.query_tokens(params["adaptors"], B, dtype=compute_dtype)
    q_pos = (n_valid + gen_len)[:, None] + jnp.arange(n_query)[None, :]
    kv_valid_q = kv_valid | (slot_range >= T_prompt + max_new)
    cache = dict(cache, index=jnp.asarray(T_prompt + max_new, jnp.int32))
    qh, _ = qwen2.forward(
        params["llm"], queries, cfg.llm, q_pos.astype(jnp.int32),
        kv_valid=kv_valid_q, causal=True,
        lora_params=params.get("lora"), cache=cache)
    preds = A.decode_predictions(params["adaptors"], qh)
    out = DrivingOutput(
        speed_wps=preds["speed_wps"],
        route=preds.get("route", jnp.zeros((B, 0, 2))),
        language_tokens=tokens,
        language_lengths=gen_len)
    if return_stats:
        return out, {"rounds": rounds, "gen_len": m}
    return out
