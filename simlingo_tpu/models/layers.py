"""Primitive neural-net layers as pure functions over parameter pytrees.

Design notes (TPU-first):
  * Parameters live in plain nested dicts => trivially shardable with
    jax.sharding partition rules and trivially convertible from HF
    checkpoints (torch state_dict key -> tree path).
  * All matmuls take ``preferred_element_type=float32`` awareness via the
    caller's precision policy: weights are stored fp32 ("master") and cast to
    the compute dtype (bf16 on TPU) at apply time.
  * Norm layers always compute in fp32 and cast back (matches HF behavior
    and keeps bf16 training stable without the reference's fp16 loss scaling,
    cf. SURVEY.md section 2.9).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def _normal(key, shape, std=0.02, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


def _kaiming_uniform(key, shape, fan_in, dtype=jnp.float32):
    # torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) applied
    # to both weight and bias. Used so randomly-initialized parity tests match
    # distributional assumptions; trained checkpoints overwrite these anyway.
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_init(key, in_dim: int, out_dim: int, use_bias: bool = True,
                dtype=jnp.float32) -> Params:
    """Weight stored as [in_dim, out_dim] (column-major wrt torch's [out, in])."""
    wkey, bkey = jax.random.split(key)
    p = {"w": _kaiming_uniform(wkey, (in_dim, out_dim), in_dim, dtype)}
    if use_bias:
        p["b"] = _kaiming_uniform(bkey, (out_dim,), in_dim, dtype)
    return p


def linear(p: Params, x: jnp.ndarray, *, dtype=None) -> jnp.ndarray:
    if "w_q" in p:      # quantized weights (core/quantize.py): scale rank
        # tells the width apart -- int8 per-output [N] vs int4 group [G, N]
        if p["scale"].ndim == 2:
            from simlingo_tpu.kernels.quantized_matmul import int4_matmul
            y = int4_matmul(x, p["w_q"], p["scale"])
        else:
            from simlingo_tpu.kernels.quantized_matmul import int8_matmul
            y = int8_matmul(x, p["w_q"], p["scale"])
    else:
        w = p["w"]
        if dtype is not None:
            w = w.astype(dtype)
            x = x.astype(dtype)
        y = x @ w
    if "b" in p:
        b = p["b"].astype(y.dtype)
        y = y + b
    return y


# ---------------------------------------------------------------------------
# Norms (fp32 internals)
# ---------------------------------------------------------------------------

def layernorm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def _ln_impl() -> str:
    from simlingo_tpu.core import gates
    return gates.ln_impl()


def layernorm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    if _ln_impl() == "pallas":
        from simlingo_tpu.kernels.layernorm import layernorm_fused
        return layernorm_fused(x, p["scale"], p["bias"], eps)
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def rmsnorm_init(dim: int, dtype=jnp.float32) -> Params:
    return {"scale": jnp.ones((dim,), dtype)}


def rmsnorm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    if _ln_impl() == "pallas":
        from simlingo_tpu.kernels.layernorm import rmsnorm_fused
        return rmsnorm_fused(x, p["scale"], eps)
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    var = (x * x).mean(axis=-1, keepdims=True)
    y = x * jax.lax.rsqrt(var + eps)
    y = y * p["scale"].astype(jnp.float32)
    return y.astype(orig_dtype)


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------

def gelu_mlp_init(key, dim: int, hidden: int, dtype=jnp.float32) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "fc1": linear_init(k1, dim, hidden, True, dtype),
        "fc2": linear_init(k2, hidden, dim, True, dtype),
    }


def gelu_mlp(p: Params, x: jnp.ndarray, approximate: bool = False) -> jnp.ndarray:
    """fc1 -> GELU -> fc2. approximate=False matches HF 'gelu' (erf-based);
    True uses the tanh form (see ViTConfig.gelu_approximate).

    The GELU output is checkpoint-named: under autodiff BOTH [*, hidden]
    intermediates (pre-GELU for the gelu VJP, post-GELU for d fc2.w) are
    residuals -- the MLP dominates activation memory. The "mlp" remat mode
    (vit.encode) recomputes just the tagged value from the saved pre-GELU
    hidden: one elementwise op in the backward frees half the MLP
    residual bytes."""
    from jax import ad_checkpoint
    h = linear(p["fc1"], x)
    h = jax.nn.gelu(h, approximate=approximate)
    h = ad_checkpoint.checkpoint_name(h, "mlp_gelu_out")
    return linear(p["fc2"], h)


def swiglu_mlp_init(key, dim: int, hidden: int, dtype=jnp.float32) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "gate": linear_init(k1, dim, hidden, False, dtype),
        "up": linear_init(k2, dim, hidden, False, dtype),
        "down": linear_init(k3, hidden, dim, False, dtype),
    }


def swiglu_mlp(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Qwen2/LLaMA gated MLP: down(silu(gate(x)) * up(x))."""
    g = linear(p["gate"], x)
    u = linear(p["up"], x)
    return linear(p["down"], jax.nn.silu(g) * u)


# ---------------------------------------------------------------------------
# Rotary position embeddings (Qwen2/LLaMA style, half-rotation layout)
# ---------------------------------------------------------------------------

def rope_frequencies(head_dim: int, theta: float = 1e6) -> jnp.ndarray:
    """inv_freq [head_dim // 2] float32."""
    exponent = jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim
    return 1.0 / (theta ** exponent)


def rope_cos_sin(position_ids: jnp.ndarray, inv_freq: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """position_ids [..., T] int -> (cos, sin) each [..., T, head_dim]."""
    angles = position_ids[..., None].astype(jnp.float32) * inv_freq  # [..., T, D/2]
    angles = jnp.concatenate([angles, angles], axis=-1)              # [..., T, D]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """x [B, T, H, D]; cos/sin [B, T, D] (HF 'rotate_half' convention)."""
    cos = cos[:, :, None, :].astype(x.dtype)
    sin = sin[:, :, None, :].astype(x.dtype)
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return x * cos + rotated * sin



# ---------------------------------------------------------------------------
# Embedding
# ---------------------------------------------------------------------------

def embedding_init(key, vocab: int, dim: int, std: float = 0.02,
                   dtype=jnp.float32) -> Params:
    return {"w": _normal(key, (vocab, dim), std, dtype)}


def embed(p: Params, ids: jnp.ndarray, *, dtype=None) -> jnp.ndarray:
    if "w_q" in p:      # per-row-quantized table (core/quantize.py)
        ids = jnp.clip(ids, 0, p["w_q"].shape[0] - 1)
        rows = jnp.take(p["w_q"], ids, axis=0)
        sc = jnp.take(p["scale"], ids, axis=0)
        if sc.ndim == rows.ndim:          # int4: per-row GROUP scales [.., G]
            # rows are nibble-PACKED int8 [.., H//2] (quantized_matmul)
            from simlingo_tpu.kernels.quantized_matmul import unpack_int4
            rows = unpack_int4(rows, axis=-1).astype(dtype or jnp.float32)
            sc = sc.astype(rows.dtype)
            H, G = rows.shape[-1], sc.shape[-1]
            rows = rows.reshape(rows.shape[:-1] + (G, H // G)) * sc[..., None]
            return rows.reshape(rows.shape[:-2] + (H,))
        rows = rows.astype(dtype or jnp.float32)
        return rows * sc.astype(rows.dtype)[..., None]  # int8: scale per row
    w = p["w"]
    if dtype is not None:
        w = w.astype(dtype)
    ids = jnp.clip(ids, 0, w.shape[0] - 1)
    return jnp.take(w, ids, axis=0)


# ---------------------------------------------------------------------------
# Generic sequential MLP used by adaptors (Linear/activation stacks)
# ---------------------------------------------------------------------------

def mlp_stack_init(key, dims, use_bias=None, dtype=jnp.float32) -> Params:
    """dims = [in, h1, ..., out]; use_bias = per-layer list or None (all True)."""
    n = len(dims) - 1
    if use_bias is None:
        use_bias = [True] * n
    keys = jax.random.split(key, n)
    return {f"l{i}": linear_init(keys[i], dims[i], dims[i + 1], use_bias[i], dtype)
            for i in range(n)}


def mlp_stack(p: Params, x: jnp.ndarray, act, final_act: bool = False) -> jnp.ndarray:
    n = len(p)
    for i in range(n):
        x = linear(p[f"l{i}"], x)
        if i < n - 1 or final_act:
            x = act(x)
    return x
