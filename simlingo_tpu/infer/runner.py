"""Inference: prefill + KV-cached greedy decode + driving-query forward.

Counterpart of reference `DrivingModel.forward` (driving.py:104-187) +
`LLM.greedy_sample` (llm.py:178-250), with the structural fix that is the
framework's single biggest latency lever (SURVEY.md section 6): the reference
re-forwards the entire prefix for every generated token (no KV cache,
llm.py:217-235) and loops over batch items in python; we prefill once, decode
single tokens against a preallocated cache inside one `lax.while_loop`, and
run the 30 driving-query tokens as one final cached forward.

Cache-slot layout (left-padded prompts so every sample ends at T_prompt):

    [0 .. T_prompt)                    prompt (left-padded; pads invalid)
    [T_prompt .. T_prompt + max_new)   generated tokens (slots >= first eos
                                       marked invalid afterwards)
    [T_prompt + max_new .. + n_query)  driving queries

RoPE positions stay *content-relative* per sample (n_valid + step), matching
the reference's packed sequence exactly; causal masking is slot-order with
dynamic q_offset (kernels/flash_attention.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from simlingo_tpu.core.structs import DrivingInput, DrivingOutput
from simlingo_tpu.models import adaptors as A
from simlingo_tpu.models import qwen2, simlingo
from simlingo_tpu.models.simlingo import SimLingoConfig


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 100
    eos_token_id: int = 151645          # <|im_end|> for InternVL2-1B chat
    cache_dtype: Any = jnp.bfloat16
    # sampling (reference LLM.sample_categorical, llm.py:145-176):
    # temperature <= 0 => greedy argmax
    temperature: float = 0.0
    top_k: int = 0                      # 0 => disabled
    top_p: float = 0.0                  # 0 => disabled
    # restrict sampling to token ids [lo, lo+n) (reference restrict_tokens)
    restrict_tokens: Optional[Tuple[int, int]] = None


def sample_categorical(rng, logits: jnp.ndarray, cfg: "GenerateConfig"
                       ) -> jnp.ndarray:
    """Token selection with temperature / top-k / top-p / restriction.

    Matches reference sample_categorical semantics (llm.py:145-176) with
    static shapes (top-k via top_k values threshold, top-p via sorted cumsum).
    """
    if cfg.restrict_tokens is not None:
        lo, n = cfg.restrict_tokens
        V = logits.shape[-1]
        ids = jnp.arange(V)
        logits = jnp.where((ids >= lo) & (ids < lo + n), logits, -jnp.inf)
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if cfg.top_k and cfg.top_k > 0:
        kth = jax.lax.top_k(logits, cfg.top_k)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    logits = logits / max(cfg.temperature, 1e-9)
    if cfg.top_p and cfg.top_p > 0.0:
        sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (incl. first above)
        keep_sorted = jnp.roll(cum <= cfg.top_p, 1, axis=-1).at[..., 0].set(True)
        # threshold logit = smallest kept sorted logit
        kept_min = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf),
                           axis=-1, keepdims=True)
        logits = jnp.where(logits >= kept_min, logits, -jnp.inf)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)


def generate_and_drive(params: Dict[str, Any], di: DrivingInput,
                       model_cfg: SimLingoConfig, gen_cfg: GenerateConfig,
                       compute_dtype=jnp.bfloat16,
                       rng: Optional[jax.Array] = None
                       ) -> DrivingOutput:
    """Greedy language generation + waypoint decoding, fully jittable.

    `di.prompt_inference` must be LEFT-padded (collate contract for
    inference batches).
    """
    cfg = model_cfg
    label = di.prompt_inference
    B, T_prompt = label.ids.shape
    H = cfg.llm.hidden_size
    n_query = cfg.num_queries
    max_new = gen_cfg.max_new_tokens
    max_len = T_prompt + max_new + n_query

    # ---- prefill ----
    embeds = simlingo.build_text_embeddings(params, label, di.pixel_values,
                                            cfg, dtype=compute_dtype)
    n_valid = label.num_valid                                   # [B]
    text_pos = jnp.clip(jnp.cumsum(label.valid, axis=1) - 1, 0, None
                        ).astype(jnp.int32)
    kv_valid_prompt = jnp.pad(label.valid, ((0, 0), (0, max_new + n_query)))

    cache = qwen2.init_cache(cfg.llm, B, max_len, dtype=gen_cfg.cache_dtype)
    hidden, cache = qwen2.forward(
        params["llm"], embeds, cfg.llm, text_pos,
        kv_valid=kv_valid_prompt, causal=True,
        lora_params=params.get("lora"), cache=cache)

    # pin the decode-carry dtype (mixed param dtypes -- e.g. int8 LLM with
    # fp32 adaptors -- would otherwise give prefill/body dtype mismatches)
    last_hidden = hidden[:, -1].astype(compute_dtype)            # [B, H]

    # ---- greedy decode (lax.while_loop with early exit) ----
    def logits_of(h):
        return qwen2.logits_from_hidden(params["llm"], h, cfg.llm)

    tokens0 = jnp.full((B, max_new), gen_cfg.eos_token_id, jnp.int32)
    done0 = jnp.zeros((B,), bool)
    slot_range = jnp.arange(max_len)[None, :]

    def cond(carry):
        step, done, _, _, _, _ = carry
        return (step < max_new) & ~done.all()

    sample_rng = rng if rng is not None else jax.random.PRNGKey(0)

    def body(carry):
        step, done, tokens, last_h, kv_valid, cache = carry
        logits = logits_of(last_h.astype(compute_dtype))         # [B, V]
        step_rng = jax.random.fold_in(sample_rng, step)
        next_tok = sample_categorical(step_rng, logits.astype(jnp.float32),
                                      gen_cfg)
        # finished sequences keep emitting eos
        next_tok = jnp.where(done, gen_cfg.eos_token_id, next_tok)
        tokens = tokens.at[:, step].set(jnp.where(done, gen_cfg.eos_token_id,
                                                  next_tok))
        newly_done = next_tok == gen_cfg.eos_token_id
        # the sampled token (incl. its eos) becomes part of the sequence,
        # matching reference greedy_sample which appends before breaking
        write_slot = T_prompt + step
        kv_valid = kv_valid | ((slot_range == write_slot) & ~done[:, None])

        tok_embed = qwen2.embed_tokens(params["llm"], next_tok[:, None],
                                       dtype=compute_dtype)      # [B, 1, H]
        pos = (n_valid + step)[:, None].astype(jnp.int32)
        cache = dict(cache, index=jnp.asarray(write_slot, jnp.int32))
        h, cache = qwen2.forward(
            params["llm"], tok_embed, cfg.llm, pos,
            kv_valid=kv_valid, causal=True,
            lora_params=params.get("lora"), cache=cache)
        done = done | newly_done
        return (step + 1, done, tokens, h[:, 0].astype(compute_dtype),
                kv_valid, cache)

    carry = (jnp.zeros((), jnp.int32), done0, tokens0, last_hidden,
             kv_valid_prompt, cache)
    steps, done, tokens, _, kv_valid, cache = jax.lax.while_loop(
        cond, body, carry)

    gen_len = (kv_valid[:, T_prompt:T_prompt + max_new]).sum(axis=1)  # [B]

    # ---- driving-query forward ----
    queries = A.query_tokens(params["adaptors"], B, dtype=compute_dtype)
    q_pos = (n_valid + gen_len)[:, None] + jnp.arange(n_query)[None, :]
    kv_valid_q = kv_valid | (slot_range >= T_prompt + max_new)
    cache = dict(cache, index=jnp.asarray(T_prompt + max_new, jnp.int32))
    qh, _ = qwen2.forward(
        params["llm"], queries, cfg.llm, q_pos.astype(jnp.int32),
        kv_valid=kv_valid_q, causal=True,
        lora_params=params.get("lora"), cache=cache)

    preds = A.decode_predictions(params["adaptors"], qh)
    return DrivingOutput(
        speed_wps=preds["speed_wps"],
        route=preds.get("route", jnp.zeros((B, 0, 2))),
        language_tokens=tokens,
        language_lengths=gen_len.astype(jnp.int32))


def drive_only(params: Dict[str, Any], di: DrivingInput,
               model_cfg: SimLingoConfig,
               compute_dtype=jnp.bfloat16) -> DrivingOutput:
    """Action-only fast path (no language generation): one forward over
    [prompt | queries], as in reference forward with predict_language=False
    (driving.py:177-186). This is the low-latency closed-loop mode."""
    cfg = model_cfg
    label = di.prompt_inference
    B = label.ids.shape[0]
    embeds, valid, pos = simlingo.assemble_sequence(
        params, label, di.pixel_values, cfg, dtype=compute_dtype)
    hidden, _ = qwen2.forward(
        params["llm"], embeds, cfg.llm, pos, kv_valid=valid, causal=True,
        lora_params=params.get("lora"))
    qh = hidden[:, -cfg.num_queries:]
    preds = A.decode_predictions(params["adaptors"], qh)
    return DrivingOutput(
        speed_wps=preds["speed_wps"],
        route=preds.get("route", jnp.zeros((B, 0, 2))),
        language_tokens=jnp.zeros((B, 0), jnp.int32),
        language_lengths=jnp.zeros((B,), jnp.int32))
