"""Post-training int8/int4 weight quantization for the inference path.

Counterpart of the reference's (absent) serving optimizations: the reference
runs closed-loop inference in bf16 with no KV cache
(team_code/agent_simlingo.py:213-223, llm.py:217-235). Our decode is
HBM-bound on weight reads, so w8a16 halves per-token latency and w4a16
(group-wise scales, kernels/quantized_matmul.py) halves it again; quality
impact is limited to the language tower (the ViT stays bf16 -- it is
compute-bound, not bandwidth-bound, and low-bit would not speed it up at
batch 1). int8 is the default serving config; int4 is opt-in (bits=4,
agent int4_llm flag) pending quality validation on real checkpoints.

Quantized linears are dicts {"w_q", "scale", "b"?}; the layer primitives
(models/layers.py, models/qwen2.py) dispatch on the "w_q" key and tell the
two widths apart by scale rank (int8: per-output 1-D; int4: group-wise 2-D).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from simlingo_tpu.kernels.quantized_matmul import (quantize_weight,
                                                   quantize_weight4)


def quantize_linear(p: Dict[str, Any], bits: int = 8,
                    group: int = 128) -> Dict[str, Any]:
    if bits == 4:
        w_q, scale = quantize_weight4(p["w"], axis=1, group=group)
    else:
        w_q, scale = quantize_weight(p["w"], axis=1)
    out = {"w_q": w_q, "scale": scale}
    if "b" in p:
        out["b"] = p["b"]
    return out


def quantize_embedding(p: Dict[str, Any], bits: int = 8,
                       group: int = 128) -> Dict[str, Any]:
    """[vocab, hidden] table, per-vocab-row scales (int4: per-row groups):
    serves both the gather (embed_tokens) and the tied LM head
    (transpose_rhs matmul)."""
    if bits == 4:
        w_q, scale = quantize_weight4(p["w"], axis=0, group=group)
    else:
        w_q, scale = quantize_weight(p["w"], axis=0)
    return {"w_q": w_q, "scale": scale}


_LLM_LINEARS = ("q", "k", "v", "o", "gate", "up", "down")


def quantize_llm(llm_params: Dict[str, Any], bits: int = 8,
                 group: int = 128) -> Dict[str, Any]:
    """Quantize every transformer linear + the (tied) embedding table.

    Norm scales stay fp32/bf16. LoRA must be merged first
    (qwen2.merge_lora) -- quantizing the merged weight preserves the
    adapters' effect.
    """
    out: Dict[str, Any] = {
        "embed": quantize_embedding(llm_params["embed"], bits, group),
        "final_norm": llm_params["final_norm"],
        "layers": {},
    }
    if "lm_head" in llm_params:
        # stored [hidden, vocab]: per-vocab(out)-channel scales
        out["lm_head"] = quantize_linear(llm_params["lm_head"], bits, group)
    for i, layer in llm_params["layers"].items():
        out["layers"][i] = {
            "ln1": layer["ln1"],
            "ln2": layer["ln2"],
            "attn": {k: (quantize_linear(v, bits, group)
                      if k in _LLM_LINEARS else v)
                     for k, v in layer["attn"].items()},
            "mlp": {k: (quantize_linear(v, bits, group)
                     if k in _LLM_LINEARS else v)
                    for k, v in layer["mlp"].items()},
        }
    return out


def quantize_for_inference(params: Dict[str, Any], llm_cfg=None,
                           bits: int = 8, group: int = 128
                           ) -> Dict[str, Any]:
    """Full-model inference quantization: LLM -> int8/int4 (LoRA merged
    first if present), vision/adaptors stay bf16."""
    from simlingo_tpu.models import qwen2

    params = dict(params)
    llm = params["llm"]
    if params.get("lora") is not None and llm_cfg is not None:
        llm = qwen2.merge_lora(llm, params.pop("lora"), llm_cfg)
    else:
        params.pop("lora", None)
    params["llm"] = quantize_llm(llm, bits, group)
    return params
