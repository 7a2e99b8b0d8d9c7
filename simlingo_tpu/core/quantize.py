"""Post-training int8 weight quantization for the inference/decode path.

Counterpart of the reference's (absent) serving optimizations: the reference
runs closed-loop inference in bf16 with no KV cache
(team_code/agent_simlingo.py:213-223, llm.py:217-235). Our decode is
HBM-bound on weight reads, so w8a16 halves per-token latency; quality impact
is limited to the language tower (the ViT stays bf16 -- it is compute-bound,
not bandwidth-bound, and int8 would not speed it up at batch 1).

Quantized linears are dicts {"w_q" int8, "scale" f32[out], "b"?}; the layer
primitives (models/layers.py, models/qwen2.py) dispatch on the "w_q" key, so
the same forward code serves bf16 and int8 weights.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from simlingo_tpu.kernels.quantized_matmul import quantize_weight


def quantize_linear(p: Dict[str, Any]) -> Dict[str, Any]:
    w_q, scale = quantize_weight(p["w"], axis=1)
    out = {"w_q": w_q, "scale": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_embedding(p: Dict[str, Any]) -> Dict[str, Any]:
    """[vocab, hidden] table, per-vocab-row scales: serves both the gather
    (embed_tokens) and the tied LM head (transpose_rhs matmul)."""
    w_q, scale = quantize_weight(p["w"], axis=0)
    return {"w_q": w_q, "scale": scale}


_LLM_LINEARS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_llm(llm_params: Dict[str, Any]) -> Dict[str, Any]:
    """Quantize every transformer linear + the (tied) embedding table.

    Norm scales stay fp32/bf16. LoRA must be merged first
    (qwen2.merge_lora) -- quantizing the merged weight preserves the
    adapters' effect.
    """
    out: Dict[str, Any] = {
        "embed": quantize_embedding(llm_params["embed"]),
        "final_norm": llm_params["final_norm"],
        "layers": {},
    }
    if "lm_head" in llm_params:
        # stored [hidden, vocab]: per-vocab(out)-channel scales
        out["lm_head"] = quantize_linear(llm_params["lm_head"])
    for i, layer in llm_params["layers"].items():
        out["layers"][i] = {
            "ln1": layer["ln1"],
            "ln2": layer["ln2"],
            "attn": {k: (quantize_linear(v) if k in _LLM_LINEARS else v)
                     for k, v in layer["attn"].items()},
            "mlp": {k: (quantize_linear(v) if k in _LLM_LINEARS else v)
                    for k, v in layer["mlp"].items()},
        }
    return out


def quantize_for_inference(params: Dict[str, Any], llm_cfg=None
                           ) -> Dict[str, Any]:
    """Full-model inference quantization: LLM -> int8 (LoRA merged first if
    present), vision/adaptors stay bf16."""
    from simlingo_tpu.models import qwen2

    params = dict(params)
    llm = params["llm"]
    if params.get("lora") is not None and llm_cfg is not None:
        llm = qwen2.merge_lora(llm, params.pop("lora"), llm_cfg)
    else:
        params.pop("lora", None)
    params["llm"] = quantize_llm(llm)
    return params
