"""HF checkpoint -> simlingo_tpu parameter-tree converters.

Handles two naming schemes:
  * transformers-native InternVL (`InternVLVisionModel` / `Qwen2Model`) --
    used by offline parity tests and by the `OpenGVLab/InternVL2-1B-hf` repo;
  * OpenGVLab remote-code InternVL2 (`vision_model.encoder.layers.N.attn.qkv`
    fused projections) -- the checkpoint format the reference loads
    (simlingo_training/models/encoder/internvl2_model.py:9) and the format of
    the published `RenzKa/simlingo` driving checkpoints.

All torch Linear weights [out, in] are transposed to [in, out]; the patch
conv kernel OIHW is permuted to (kh, kw, in, out) and flattened to match
vit._patchify's (ph, pw, c) ordering.

Also provides LoRA-merge: peft stores `base_layer.weight` + `lora_A/B`; we
either merge (W += B@A * alpha/r) or carry A/B into a lora tree.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from simlingo_tpu.models.qwen2 import Qwen2Config
from simlingo_tpu.models.vit import ViTConfig


def _t(x) -> np.ndarray:
    """torch tensor -> numpy (float32 for safety; cast later by policy)."""
    return np.asarray(x.detach().cpu().float().numpy()) if hasattr(x, "detach") else np.asarray(x)


def _linear(sd: Mapping[str, Any], prefix: str, bias: Optional[bool] = None) -> Dict[str, np.ndarray]:
    p = {"w": _t(sd[f"{prefix}.weight"]).T}
    if bias is None:
        bias = f"{prefix}.bias" in sd
    if bias:
        p["b"] = _t(sd[f"{prefix}.bias"])
    return p


# ---------------------------------------------------------------------------
# Qwen2 (transformers-native naming: model.layers.N.self_attn.q_proj ...)
# ---------------------------------------------------------------------------

def qwen2_from_torch(sd: Mapping[str, Any], cfg: Qwen2Config,
                     prefix: str = "") -> Dict[str, Any]:
    def key(s):
        return f"{prefix}{s}"

    p: Dict[str, Any] = {
        "embed": {"w": _t(sd[key("embed_tokens.weight")])},
        "final_norm": {"scale": _t(sd[key("norm.weight")])},
        "layers": {},
    }
    if not cfg.tie_word_embeddings and key("lm_head.weight") in sd:
        p["lm_head"] = {"w": _t(sd[key("lm_head.weight")]).T}
    for i in range(cfg.num_layers):
        lp = key(f"layers.{i}.")
        p["layers"][str(i)] = {
            "ln1": {"scale": _t(sd[f"{lp}input_layernorm.weight"])},
            "ln2": {"scale": _t(sd[f"{lp}post_attention_layernorm.weight"])},
            "attn": {
                "q": _linear(sd, f"{lp}self_attn.q_proj"),
                "k": _linear(sd, f"{lp}self_attn.k_proj"),
                "v": _linear(sd, f"{lp}self_attn.v_proj"),
                "o": _linear(sd, f"{lp}self_attn.o_proj"),
            },
            "mlp": {
                "gate": _linear(sd, f"{lp}mlp.gate_proj"),
                "up": _linear(sd, f"{lp}mlp.up_proj"),
                "down": _linear(sd, f"{lp}mlp.down_proj"),
            },
        }
    return p


# ---------------------------------------------------------------------------
# InternViT
# ---------------------------------------------------------------------------

def _conv_patch_embed(w: np.ndarray, b: np.ndarray) -> Dict[str, np.ndarray]:
    # OIHW -> (kh, kw, in) x out, matching vit._patchify flatten order
    o, i, kh, kw = w.shape
    wt = w.transpose(2, 3, 1, 0).reshape(kh * kw * i, o)
    return {"w": wt, "b": b}


def vit_from_torch_native(sd: Mapping[str, Any], cfg: ViTConfig,
                          prefix: str = "") -> Dict[str, Any]:
    """transformers-native InternVLVisionModel naming."""
    def key(s):
        return f"{prefix}{s}"

    p: Dict[str, Any] = {
        "patch_embed": _conv_patch_embed(
            _t(sd[key("embeddings.patch_embeddings.projection.weight")]),
            _t(sd[key("embeddings.patch_embeddings.projection.bias")])),
        "cls_token": _t(sd[key("embeddings.cls_token")]),
        "pos_embed": _t(sd[key("embeddings.position_embeddings")]),
        "layers": {},
    }
    for i in range(cfg.num_layers):
        lp = key(f"encoder.layer.{i}.")
        p["layers"][str(i)] = {
            "ln1": {"scale": _t(sd[f"{lp}layernorm_before.weight"]),
                    "bias": _t(sd[f"{lp}layernorm_before.bias"])},
            "ln2": {"scale": _t(sd[f"{lp}layernorm_after.weight"]),
                    "bias": _t(sd[f"{lp}layernorm_after.bias"])},
            "attn": {
                "q": _linear(sd, f"{lp}attention.q_proj"),
                "k": _linear(sd, f"{lp}attention.k_proj"),
                "v": _linear(sd, f"{lp}attention.v_proj"),
                "o": _linear(sd, f"{lp}attention.projection_layer"),
            },
            "ls1": _t(sd[f"{lp}lambda_1"]),
            "ls2": _t(sd[f"{lp}lambda_2"]),
            "mlp": {
                "fc1": _linear(sd, f"{lp}mlp.fc1"),
                "fc2": _linear(sd, f"{lp}mlp.fc2"),
            },
        }
    return p


def vit_from_torch_remote(sd: Mapping[str, Any], cfg: ViTConfig,
                          prefix: str = "vision_model.") -> Dict[str, Any]:
    """OpenGVLab remote-code InternVisionModel naming (fused qkv)."""
    def key(s):
        return f"{prefix}{s}"

    H = cfg.hidden_size
    p: Dict[str, Any] = {
        "patch_embed": _conv_patch_embed(
            _t(sd[key("embeddings.patch_embedding.weight")]),
            _t(sd[key("embeddings.patch_embedding.bias")])),
        "cls_token": _t(sd[key("embeddings.class_embedding")]),
        "pos_embed": _t(sd[key("embeddings.position_embedding")]),
        "layers": {},
    }
    for i in range(cfg.num_layers):
        lp = key(f"encoder.layers.{i}.")
        qkv_w = _t(sd[f"{lp}attn.qkv.weight"])          # [3H, H]
        qkv_b = _t(sd[f"{lp}attn.qkv.bias"]) if f"{lp}attn.qkv.bias" in sd else None
        qw, kw, vw = qkv_w[:H].T, qkv_w[H:2 * H].T, qkv_w[2 * H:].T
        attn = {
            "q": {"w": qw}, "k": {"w": kw}, "v": {"w": vw},
            "o": _linear(sd, f"{lp}attn.proj"),
        }
        if qkv_b is not None:
            attn["q"]["b"], attn["k"]["b"], attn["v"]["b"] = (
                qkv_b[:H], qkv_b[H:2 * H], qkv_b[2 * H:])
        p["layers"][str(i)] = {
            "ln1": {"scale": _t(sd[f"{lp}norm1.weight"]),
                    "bias": _t(sd[f"{lp}norm1.bias"])},
            "ln2": {"scale": _t(sd[f"{lp}norm2.weight"]),
                    "bias": _t(sd[f"{lp}norm2.bias"])},
            "attn": attn,
            "ls1": _t(sd[f"{lp}ls1"]),
            "ls2": _t(sd[f"{lp}ls2"]),
            "mlp": {
                "fc1": _linear(sd, f"{lp}mlp.fc1"),
                "fc2": _linear(sd, f"{lp}mlp.fc2"),
            },
        }
    return p


def projector_from_torch(sd: Mapping[str, Any], prefix: str = "mlp1.") -> Dict[str, Any]:
    """InternVL2 remote-code mlp1 projector: [LN, Linear, GELU, Linear]."""
    return {
        "ln": {"scale": _t(sd[f"{prefix}0.weight"]), "bias": _t(sd[f"{prefix}0.bias"])},
        "fc1": _linear(sd, f"{prefix}1"),
        "fc2": _linear(sd, f"{prefix}3"),
    }


def projector_from_torch_native(sd: Mapping[str, Any],
                                prefix: str = "multi_modal_projector.") -> Dict[str, Any]:
    return {
        "ln": {"scale": _t(sd[f"{prefix}layer_norm.weight"]),
               "bias": _t(sd[f"{prefix}layer_norm.bias"])},
        "fc1": _linear(sd, f"{prefix}linear_1"),
        "fc2": _linear(sd, f"{prefix}linear_2"),
    }


# ---------------------------------------------------------------------------
# LoRA handling (peft state dicts)
# ---------------------------------------------------------------------------

_PEFT_PROJ_NAMES = {"q_proj": "q", "k_proj": "k", "v_proj": "v",
                    "o_proj": "o", "gate_proj": "gate", "up_proj": "up",
                    "down_proj": "down"}


def lora_tree_from_torch(sd: Mapping[str, Any], num_layers: int
                         ) -> Dict[str, Any]:
    """Extract peft LoRA adapters UNMERGED into the qwen2.init_lora_params
    layout: layers/{i}/{q,k,v,o,gate,up,down}/{a [din, r], b [r, dout]}.

    peft stores A [r, in] / B [out, r]; ours compute x @ a @ b, so both are
    transposed. Missing targets (non-all-linear configs) are simply absent
    from the returned tree."""
    layers: Dict[str, Dict[str, Any]] = {}
    for k in sd:
        if ".lora_A." not in k:
            continue
        mod = k.split(".lora_A.")[0]
        parts = mod.split(".")
        proj = _PEFT_PROJ_NAMES.get(parts[-1])
        try:
            li = parts[parts.index("layers") + 1]
        except (ValueError, IndexError):
            continue
        if proj is None or int(li) >= num_layers:
            continue
        b_key = k.replace(".lora_A.", ".lora_B.")
        if b_key not in sd:
            continue
        layers.setdefault(li, {})[proj] = {
            "a": _t(sd[k]).T, "b": _t(sd[b_key]).T}
    return {"layers": layers}


def strip_peft_inplace(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Rename peft-wrapped keys to clean names WITHOUT merging LoRA
    (base_layer.weight -> weight; lora_A/B keys dropped -- extract them
    first via lora_tree_from_torch)."""
    out: Dict[str, Any] = {}
    for k, v in sd.items():
        if ".lora_A." in k or ".lora_B." in k:
            continue
        nk = (k.replace(".base_layer.weight", ".weight")
               .replace(".base_layer.bias", ".bias")
               .replace("base_model.model.", "")
               .replace(".modules_to_save.default", ""))
        out[nk] = v
    return out


def merge_lora_inplace(sd: Dict[str, Any], alpha: float, r: int) -> Dict[str, Any]:
    """Merge peft LoRA weights into their base layers and strip peft prefixes.

    peft names: `<module>.base_layer.weight`, `<module>.lora_A.default.weight`
    [r, in], `<module>.lora_B.default.weight` [out, r]. Merged:
    W += (alpha / r) * B @ A. Returns a new flat dict with clean names.
    """
    out: Dict[str, Any] = {}
    scale = alpha / r
    for k in list(sd.keys()):
        if ".lora_A." in k or ".lora_B." in k:
            continue
        if k.endswith(".base_layer.weight"):
            mod = k[: -len(".base_layer.weight")]
            w = _t(sd[k])
            a_key = f"{mod}.lora_A.default.weight"
            b_key = f"{mod}.lora_B.default.weight"
            if a_key in sd and b_key in sd:
                w = w + scale * (_t(sd[b_key]) @ _t(sd[a_key]))
            out[f"{mod}.weight"] = w
        elif k.endswith(".base_layer.bias"):
            mod = k[: -len(".base_layer.bias")]
            out[f"{mod}.bias"] = _t(sd[k])
        else:
            out[k] = sd[k]
    # strip peft wrapper prefixes like "base_model.model."
    cleaned = {}
    for k, v in out.items():
        nk = k.replace("base_model.model.", "").replace(".modules_to_save.default", "")
        cleaned[nk] = v
    return cleaned
