"""Qwen2 decoder-only LLM (the InternVL2-1B language tower), pure-functional JAX.

Behavioral counterpart of the reference's HF Qwen2 loaded via
`AutoModel.from_pretrained(InternVL2-1B).language_model`
(reference simlingo_training/models/language_model/llm.py:87-93), re-built
TPU-first:

  * operates on *input embeddings* (the VLA model splices image features and
    waypoint embeddings into the sequence before the LLM, so token-id lookup
    happens in the adaptors);
  * explicit position ids (RoPE) + key-validity mask: supports the framework's
    static right-padded layout (see core/structs.py);
  * attention via the Pallas flash kernel on TPU (kernels/flash_attention.py);
  * optional LoRA (r, alpha on all linear projections -- the reference uses
    peft target_modules="all-linear", llm.py:106-119);
  * optional KV cache for prefill + single-token decode (the reference has NO
    cache and re-forwards the whole prefix per token, llm.py:217-235).

Architecture constants (Qwen2-0.5B-Instruct inside InternVL2-1B): hidden 896,
24 layers, 14 query heads / 2 kv heads, head_dim 64, intermediate 4864,
RMSNorm eps 1e-6, rope_theta 1e6, SwiGLU MLP, qkv-bias yes / o-bias no,
tied word embeddings.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from simlingo_tpu.kernels.flash_attention import attention
from simlingo_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151674          # InternVL2-1B tokenizer (incl. IMG tokens)
    hidden_size: int = 896
    num_layers: int = 24
    num_heads: int = 14
    num_kv_heads: int = 2
    head_dim: int = 64
    intermediate_size: int = 4864
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    tie_word_embeddings: bool = True
    qkv_bias: bool = True              # Qwen2 yes; LLaMA-family no
    # LoRA (None => disabled)
    lora_r: int = 0
    lora_alpha: int = 0
    lora_dropout: float = 0.0

    @staticmethod
    def tiny(vocab_size: int = 512) -> "Qwen2Config":
        """Small config for tests."""
        return Qwen2Config(vocab_size=vocab_size, hidden_size=64, num_layers=2,
                           num_heads=4, num_kv_heads=2, head_dim=16,
                           intermediate_size=128)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_params(key, cfg: Qwen2Config, dtype=jnp.float32) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_layers + 2)
    H, D = cfg.hidden_size, cfg.head_dim
    p: Dict[str, Any] = {
        "embed": L.embedding_init(keys[0], cfg.vocab_size, H, dtype=dtype),
        "final_norm": L.rmsnorm_init(H, dtype),
        "layers": {},
    }
    if not cfg.tie_word_embeddings:
        p["lm_head"] = {"w": L._normal(keys[1], (H, cfg.vocab_size), dtype=dtype)}
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[i + 2], 8)
        p["layers"][str(i)] = {
            "ln1": L.rmsnorm_init(H, dtype),
            "ln2": L.rmsnorm_init(H, dtype),
            "attn": {
                "q": L.linear_init(k[0], H, cfg.num_heads * D, cfg.qkv_bias, dtype),
                "k": L.linear_init(k[1], H, cfg.num_kv_heads * D, cfg.qkv_bias, dtype),
                "v": L.linear_init(k[2], H, cfg.num_kv_heads * D, cfg.qkv_bias, dtype),
                "o": L.linear_init(k[3], cfg.num_heads * D, H, False, dtype),
            },
            "mlp": L.swiglu_mlp_init(k[4], H, cfg.intermediate_size, dtype),
        }
    return p


_LORA_TARGETS = ("q", "k", "v", "o", "gate", "up", "down")


def init_lora_params(key, cfg: Qwen2Config, dtype=jnp.float32) -> Dict[str, Any]:
    """LoRA A/B for every linear projection in every layer (peft 'all-linear')."""
    assert cfg.lora_r > 0
    H, D = cfg.hidden_size, cfg.head_dim
    dims = {
        "q": (H, cfg.num_heads * D), "k": (H, cfg.num_kv_heads * D),
        "v": (H, cfg.num_kv_heads * D), "o": (cfg.num_heads * D, H),
        "gate": (H, cfg.intermediate_size), "up": (H, cfg.intermediate_size),
        "down": (cfg.intermediate_size, H),
    }
    p: Dict[str, Any] = {"layers": {}}
    keys = jax.random.split(key, cfg.num_layers)
    for i in range(cfg.num_layers):
        lk = jax.random.split(keys[i], len(_LORA_TARGETS))
        layer = {}
        for j, name in enumerate(_LORA_TARGETS):
            din, dout = dims[name]
            # peft init: A kaiming-uniform, B zeros => identity at start
            layer[name] = {
                "a": L._kaiming_uniform(lk[j], (din, cfg.lora_r), din, dtype),
                "b": jnp.zeros((cfg.lora_r, dout), dtype),
            }
        p["layers"][str(i)] = layer
    return p


def merge_lora(params: Dict[str, Any], lora_params: Dict[str, Any],
               cfg: Qwen2Config) -> Dict[str, Any]:
    """Fold LoRA adapters into the base weights (W += (alpha/r) * A @ B).

    Used at inference: removes the per-layer low-rank matmuls from the
    decode hot loop (the reference merges via peft before export).
    """
    scale = cfg.lora_alpha / cfg.lora_r
    out = jax.tree_util.tree_map(lambda x: x, params)  # shallow-ish copy
    for i_str, layer in lora_params["layers"].items():
        lp = out["layers"][i_str]
        for name, ab in layer.items():
            tgt = lp["attn"] if name in ("q", "k", "v", "o") else lp["mlp"]
            w = tgt[name]["w"]
            tgt[name] = dict(tgt[name])
            tgt[name]["w"] = w + scale * (ab["a"] @ ab["b"]).astype(w.dtype)
    return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _lora_drop_delta(x, a, b, seed, rate):
    """(dropout(x) @ a) @ b with hardware-PRNG dropout (kernels/dropout.py).

    One custom_vjp over the whole LoRA branch so the ONLY activation residual
    is `x` itself -- shared across the q/k/v (and gate/up) adapters that read
    the same input, deduped by XLA. The dropout mask is never stored: the
    backward re-seeds the on-core PRNG and regenerates it. (threefry
    bernoulli masks cost ~78 ms/step at SimLingo shapes and ~1.2 GB of
    residents; this path is pure-bandwidth with zero mask memory.)
    """
    from simlingo_tpu.kernels.dropout import hw_dropout
    xl = hw_dropout(x, seed, rate)
    return (xl @ a) @ b


def _lora_drop_fwd(x, a, b, seed, rate):
    return _lora_drop_delta(x, a, b, seed, rate), (x, a, b, seed)


def _lora_drop_bwd(rate, res, g):
    from simlingo_tpu.kernels.dropout import hw_dropout
    x, a, b, seed = res
    xl = hw_dropout(x, seed, rate)          # regenerated, not stored
    gb = g @ b.T                            # [..., r]
    da = jnp.einsum("...c,...r->cr", xl, gb).astype(a.dtype)
    db = jnp.einsum("...r,...n->rn", xl @ a, g).astype(b.dtype)
    dx = hw_dropout(gb @ a.T, seed, rate)   # mask+scale is linear/symmetric
    return dx, da, db, None


_lora_drop_delta.defvjp(_lora_drop_fwd, _lora_drop_bwd)


@_functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _lora_drop_delta_glu(xg, xu, a, b, seed, rate):
    """LoRA-dropout delta on the gated-MLP product: (drop(silu(xg)*xu)@a)@b.

    Variant of _lora_drop_delta for the `down` adapter whose input is the
    [B, T, intermediate] silu product: saving that product as a residual
    costs 46 MB/layer; xg/xu are residuals of the surrounding autodiff
    anyway, so this recomputes the product (one silu + multiply) in the
    backward instead.
    """
    from simlingo_tpu.kernels.dropout import hw_dropout
    h = jax.nn.silu(xg) * xu
    return (hw_dropout(h, seed, rate) @ a) @ b


def _lora_drop_glu_fwd(xg, xu, a, b, seed, rate):
    return _lora_drop_delta_glu(xg, xu, a, b, seed, rate), (xg, xu, a, b, seed)


def _lora_drop_glu_bwd(rate, res, g):
    from simlingo_tpu.kernels.dropout import hw_dropout
    xg, xu, a, b, seed = res
    sg = jax.nn.sigmoid(xg.astype(jnp.float32))
    s = (xg.astype(jnp.float32) * sg).astype(xg.dtype)       # silu(xg)
    h = s * xu
    xl = hw_dropout(h, seed, rate)
    gb = g @ b.T
    da = jnp.einsum("...c,...r->cr", xl, gb).astype(a.dtype)
    db = jnp.einsum("...r,...n->rn", xl @ a, g).astype(b.dtype)
    dh = hw_dropout(gb @ a.T, seed, rate)
    dxu = dh * s
    # d silu(z)/dz = sigmoid(z) * (1 + z * (1 - sigmoid(z)))
    dsilu = (sg * (1 + xg.astype(jnp.float32) * (1 - sg))).astype(xg.dtype)
    dxg = dh * xu * dsilu
    return dxg, dxu, da, db, None


_lora_drop_delta_glu.defvjp(_lora_drop_glu_fwd, _lora_drop_glu_bwd)


def _linear_maybe_lora(p, lora, x, cfg: Qwen2Config, dropout_seed=None):
    y = L.linear(p, x)
    if lora is not None:
        scale = cfg.lora_alpha / cfg.lora_r
        a = lora["a"].astype(x.dtype)
        b = lora["b"].astype(x.dtype)
        if dropout_seed is not None and cfg.lora_dropout > 0:
            y = y + scale * _lora_drop_delta(x, a, b, dropout_seed,
                                             cfg.lora_dropout)
        else:
            y = y + scale * ((x @ a) @ b)
    return y


def _lora_fused_enabled() -> bool:
    from simlingo_tpu.core import gates
    return gates.lora_fused()


def _fused_lora_delta(x, adapters, cfg: Qwen2Config, seed):
    """One LoRA delta for several adapters sharing the same input.

    SIMLINGO_LORA_FUSED=1 lever: concatenate the A matrices ([H, n*r],
    one matmul at n-fold lane width instead of n rank-r slivers) and
    place the B matrices on the block diagonal of [n*r, sum(douts)]
    (off-diagonal zeros contribute nothing and receive no gradient by
    construction), so the whole q/k/v (or gate/up) adapter group costs
    TWO matmuls + ONE dropout pass instead of 2n matmuls + n dropout
    passes. Deliberate semantic delta vs peft: the group shares one
    dropout mask (peft draws per-adapter masks) -- inference outputs are
    identical (dropout off), only training stochasticity differs;
    gated off by default until chip-measured (docs/BENCH_NOTES.md).

    Returns the concatenated delta [..., sum(douts)] (caller splits) --
    NOT scaled by alpha/r.
    """
    r = cfg.lora_r
    douts = [ad["b"].shape[1] for ad in adapters]
    a_cat = jnp.concatenate([ad["a"].astype(x.dtype) for ad in adapters],
                            axis=1)                       # [H, n*r]
    b_blk = jnp.zeros((len(adapters) * r, sum(douts)), x.dtype)
    col = 0
    for i, ad in enumerate(adapters):
        b_blk = jax.lax.dynamic_update_slice(
            b_blk, ad["b"].astype(x.dtype), (i * r, col))
        col += douts[i]
    if seed is not None and cfg.lora_dropout > 0:
        return _lora_drop_delta(x, a_cat, b_blk, seed, cfg.lora_dropout)
    return (x @ a_cat) @ b_blk


def _attn_block(p, lora, x, cfg: Qwen2Config, cos, sin, kv_valid, causal,
                cache=None, cache_index=None, dropout_seeds=None):
    """Self-attention with RoPE/GQA; optionally reads+updates a KV cache.

    cache: dict with 'k','v' [B, max_len, HK, D] preallocated buffers.
    cache_index: int32 scalar -- write offset of the current chunk.
    """
    B, T, H = x.shape
    nh, nkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def lr(name, inp):
        seed = dropout_seeds[name] if dropout_seeds else None
        return _linear_maybe_lora(p[name], lora.get(name) if lora else None,
                                  inp, cfg, seed)

    if (_lora_fused_enabled() and lora
            and all(lora.get(t) is not None for t in ("q", "k", "v"))):
        # fused q/k/v adapter group (see _fused_lora_delta)
        scale = cfg.lora_alpha / cfg.lora_r
        seed = dropout_seeds["q"] if dropout_seeds else None
        delta = _fused_lora_delta(x, [lora[t] for t in ("q", "k", "v")],
                                  cfg, seed)
        nq, nk = nh * hd, nkv * hd
        q = (L.linear(p["q"], x) + scale * delta[..., :nq])
        k = (L.linear(p["k"], x) + scale * delta[..., nq:nq + nk])
        v = (L.linear(p["v"], x) + scale * delta[..., nq + nk:])
        q = q.reshape(B, T, nh, hd)
        k = k.reshape(B, T, nkv, hd)
        v = v.reshape(B, T, nkv, hd)
    else:
        q = lr("q", x).reshape(B, T, nh, hd)
        k = lr("k", x).reshape(B, T, nkv, hd)
        v = lr("v", x).reshape(B, T, nkv, hd)

    q = L.apply_rope(q, cos, sin)
    k = L.apply_rope(k, cos, sin)

    new_cache = None
    q_offset = None
    if cache is not None:
        ck = jax.lax.dynamic_update_slice(cache["k"], k.astype(cache["k"].dtype),
                                          (0, cache_index, 0, 0))
        cv = jax.lax.dynamic_update_slice(cache["v"], v.astype(cache["v"].dtype),
                                          (0, cache_index, 0, 0))
        new_cache = {"k": ck, "v": cv}
        k, v = ck, cv
        # q tokens occupy cache slots [cache_index, cache_index + T): causal
        # masking with a dynamic offset covers prefill, decode, and the
        # driving-query forward uniformly.
        q_offset = cache_index

    # single-token decode: the XLA einsum path beats a padded flash kernel
    use_pallas = None if T >= 64 else False
    out = attention(q, k, v, kv_valid, causal=causal, q_offset=q_offset,
                    use_pallas=use_pallas)
    out = out.reshape(B, T, nh * hd)
    seed = dropout_seeds["o"] if dropout_seeds else None
    return _linear_maybe_lora(p["o"], lora.get("o") if lora else None,
                              out, cfg, seed), new_cache


def _mlp_block(p, lora, x, cfg: Qwen2Config, dropout_seeds=None):
    def lr(name, inp):
        seed = dropout_seeds[name] if dropout_seeds else None
        return _linear_maybe_lora(p[name], lora.get(name) if lora else None,
                                  inp, cfg, seed)

    if (_lora_fused_enabled() and lora
            and lora.get("gate") is not None and lora.get("up") is not None):
        # fused gate/up adapter group (see _fused_lora_delta)
        scale = cfg.lora_alpha / cfg.lora_r
        seed = dropout_seeds["gate"] if dropout_seeds else None
        delta = _fused_lora_delta(x, [lora["gate"], lora["up"]], cfg, seed)
        inter = lora["gate"]["b"].shape[1]
        xg = L.linear(p["gate"], x) + scale * delta[..., :inter]
        xu = L.linear(p["up"], x) + scale * delta[..., inter:]
        down_lora = lora.get("down")
        if down_lora is not None and dropout_seeds is not None \
                and cfg.lora_dropout > 0:
            h = jax.nn.silu(xg) * xu
            y = L.linear(p["down"], h)
            return y + scale * _lora_drop_delta_glu(
                xg, xu, down_lora["a"].astype(x.dtype),
                down_lora["b"].astype(x.dtype), dropout_seeds["down"],
                cfg.lora_dropout)
        return lr("down", jax.nn.silu(xg) * xu)

    down_lora = lora.get("down") if lora else None
    if down_lora is not None and dropout_seeds is not None \
            and cfg.lora_dropout > 0:
        # GLU-aware LoRA-dropout delta: avoids saving the [B, T, inter]
        # silu product as a residual (see _lora_drop_delta_glu)
        xg, xu = lr("gate", x), lr("up", x)
        h = jax.nn.silu(xg) * xu
        y = L.linear(p["down"], h)
        scale = cfg.lora_alpha / cfg.lora_r
        return y + scale * _lora_drop_delta_glu(
            xg, xu, down_lora["a"].astype(x.dtype),
            down_lora["b"].astype(x.dtype), dropout_seeds["down"],
            cfg.lora_dropout)
    return lr("down", jax.nn.silu(lr("gate", x)) * lr("up", x))


def _layer_seeds(dropout_rng, layer_idx, mb_idx=None):
    """7 independent int32 seeds (one per LoRA target) for the hardware-PRNG
    dropout kernels. layer_idx/mb_idx may be traced (pipeline path)."""
    key = jax.random.fold_in(dropout_rng, layer_idx)
    if mb_idx is not None:
        # pipeline microbatches see different logical shapes; fold the
        # microbatch id in so masks stay independent across microbatches
        key = jax.random.fold_in(key, mb_idx)
    s7 = jax.random.bits(key, (7,), "uint32").astype(jnp.int32)
    return {name: s7[i:i + 1] for i, name in enumerate(
        ("q", "k", "v", "o", "gate", "up", "down"))}


def _decoder_layer(lp, lo, x, cfg: Qwen2Config, cos, sin, kv_valid,
                   seeds, causal: bool) -> jnp.ndarray:
    """One cache-free decoder layer (pre-norm attn + MLP residual blocks).
    `lo` is the split {'attn': {...}, 'mlp': {...}} adapter dict or None."""
    a, _ = _attn_block(lp["attn"], lo.get("attn") if lo else None,
                       L.rmsnorm(lp["ln1"], x, cfg.rms_norm_eps), cfg,
                       cos, sin, kv_valid, causal,
                       cache=None, cache_index=None, dropout_seeds=seeds)
    x = x + a
    m = _mlp_block(lp["mlp"], lo.get("mlp") if lo else None,
                   L.rmsnorm(lp["ln2"], x, cfg.rms_norm_eps), cfg, seeds)
    return x + m


def _split_lora(ll: Optional[Dict[str, Any]]) -> Optional[Dict[str, Any]]:
    """Per-layer adapter dict -> the split form _decoder_layer expects.
    .get: converted peft checkpoints may adapt a subset of the all-linear
    targets; absent adapters are identity."""
    if ll is None:
        return None
    return {"attn": {t: ll.get(t) for t in ("q", "k", "v", "o")},
            "mlp": {t: ll.get(t) for t in ("gate", "up", "down")}}


def forward(
    params: Dict[str, Any],
    inputs_embeds: jnp.ndarray,              # [B, T, H]
    cfg: Qwen2Config,
    position_ids: jnp.ndarray,               # [B, T] int32
    kv_valid: Optional[jnp.ndarray] = None,  # [B, T] (or [B, max_len] w/ cache)
    causal: bool = True,
    lora_params: Optional[Dict[str, Any]] = None,
    cache: Optional[Dict[str, Any]] = None,  # {'layers': {i: {'k','v'}}, 'index'}
    remat: bool = False,
    dropout_rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Optional[Dict[str, Any]]]:
    """Run the decoder stack on pre-built input embeddings.

    Accepts both layer-param layouts: the legacy dict-of-layers
    (params["layers"]["0"]...) and the stacked layout (leaves with a
    leading layer dim, parallel/pipeline.stack_layer_tree). With a
    pipeline context enabled (parallel/pipeline.enable) and no KV cache,
    stacked layouts run as a pp-sharded GPipe pipeline.

    Returns (last_hidden_state [B, T, H] -- post final RMSNorm, new_cache).
    """
    x = inputs_embeds
    inv_freq = L.rope_frequencies(cfg.head_dim, cfg.rope_theta)
    cos, sin = L.rope_cos_sin(position_ids, inv_freq)

    from simlingo_tpu.parallel import pipeline as _pl
    stacked = _pl.is_stacked(params["layers"])
    if stacked and cache is None:
        return _forward_stacked(params, x, cfg, cos, sin, kv_valid, causal,
                                lora_params, dropout_rng), None
    assert not stacked, (
        "stacked layer layout has no KV-cache decode path; unstack via "
        "parallel.pipeline.unstack_layer_tree for inference")

    cache_index = cache["index"] if cache is not None else None
    new_cache = {"layers": {}, "index": None} if cache is not None else None

    def layer_fn(x, lp, lo, layer_cache, layer_idx):
        seeds = None
        if dropout_rng is not None and cfg.lora_dropout > 0 and lora_params is not None:
            seeds = _layer_seeds(dropout_rng, layer_idx)
        a, upd = _attn_block(lp["attn"], lo.get("attn") if lo else None,
                             L.rmsnorm(lp["ln1"], x, cfg.rms_norm_eps), cfg,
                             cos, sin, kv_valid, causal,
                             cache=layer_cache, cache_index=cache_index,
                             dropout_seeds=seeds)
        x = x + a
        m = _mlp_block(lp["mlp"], lo.get("mlp") if lo else None,
                       L.rmsnorm(lp["ln2"], x, cfg.rms_norm_eps), cfg, seeds)
        return x + m, upd

    for i in range(cfg.num_layers):
        lp = params["layers"][str(i)]
        lo = None
        if lora_params is not None:
            lo = _split_lora(lora_params["layers"].get(str(i), {}))
        layer_cache = cache["layers"][str(i)] if cache is not None else None
        fn = jax.checkpoint(layer_fn, static_argnums=(4,)) if (remat and cache is None) else layer_fn
        x, upd = fn(x, lp, lo, layer_cache, i)
        if new_cache is not None:
            new_cache["layers"][str(i)] = upd

    if new_cache is not None:
        new_cache["index"] = cache_index + inputs_embeds.shape[1]
    x = L.rmsnorm(params["final_norm"], x, cfg.rms_norm_eps)
    return x, new_cache


def _forward_stacked(params, x, cfg: Qwen2Config, cos, sin, kv_valid,
                     causal, lora_params, dropout_rng) -> jnp.ndarray:
    """Decoder stack over the STACKED layer layout (leaves [L, ...]).

    With a pipeline context active (parallel/pipeline.enable), the layers
    run as a pp-sharded GPipe pipeline; otherwise they run sequentially on
    static per-layer slices (so single-device code works on the stacked
    layout unchanged -- used by the pp parity tests)."""
    from simlingo_tpu.parallel import pipeline as _pl
    stk = params["layers"]
    lstk = None
    if lora_params is not None:
        lstk = lora_params["layers"]
        assert _pl.is_stacked(lstk), \
            "stacked LLM layers require stacked LoRA (stack_layer_tree)"
    use_seeds = (dropout_rng is not None and cfg.lora_dropout > 0
                 and lora_params is not None)

    if _pl.active_axis() is not None:
        def pp_layer(lp, lo, x_mb, aux, gidx, mb_idx):
            cos_mb, sin_mb, valid_mb = aux
            seeds = (_layer_seeds(dropout_rng, gidx, mb_idx)
                     if use_seeds else None)
            return _decoder_layer(lp, _split_lora(lo), x_mb, cfg, cos_mb,
                                  sin_mb, valid_mb, seeds, causal)
        x = _pl.pipeline_layers(stk, lstk, x, (cos, sin, kv_valid), pp_layer)
    else:
        for i in range(cfg.num_layers):
            lp = _pl.layer_at(stk, i)
            lo = (_split_lora(_pl.layer_at(lstk, i))
                  if lstk is not None else None)
            seeds = _layer_seeds(dropout_rng, i) if use_seeds else None
            x = _decoder_layer(lp, lo, x, cfg, cos, sin, kv_valid, seeds,
                               causal)
    return L.rmsnorm(params["final_norm"], x, cfg.rms_norm_eps)


def logits_from_hidden(params, hidden, cfg: Qwen2Config) -> jnp.ndarray:
    """LM head (tied to embeddings unless a separate lm_head exists)."""
    if "lm_head" in params:
        return L.linear(params["lm_head"], hidden)
    if "w_q" in params["embed"]:    # quantized table: [vocab, H] tied head
        emb = params["embed"]
        if emb["scale"].ndim == 2:  # int4: per-row group scales [vocab, G]
            from simlingo_tpu.kernels.quantized_matmul import int4_matmul
            return int4_matmul(hidden, emb["w_q"], emb["scale"],
                               transpose_rhs=True)
        from simlingo_tpu.kernels.quantized_matmul import int8_matmul
        return int8_matmul(hidden, emb["w_q"], emb["scale"],
                           transpose_rhs=True)
    w = params["embed"]["w"].T
    return hidden @ w.astype(hidden.dtype)


def embed_tokens(params, ids, dtype=None) -> jnp.ndarray:
    return L.embed(params["embed"], ids, dtype=dtype)


def init_cache(cfg: Qwen2Config, batch: int, max_len: int,
               dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Preallocated KV cache (static shapes for jit)."""
    shape = (batch, max_len, cfg.num_kv_heads, cfg.head_dim)
    return {
        "layers": {str(i): {"k": jnp.zeros(shape, dtype),
                            "v": jnp.zeros(shape, dtype)}
                   for i in range(cfg.num_layers)},
        "index": jnp.zeros((), jnp.int32),
    }
