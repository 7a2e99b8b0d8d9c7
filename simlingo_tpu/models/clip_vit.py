"""CLIP ViT vision tower + LLaVA-NeXT feature path for SimLingo-Base.

Behavioral counterpart of reference
`simlingo_base_training/models/encoder/llavanext{,_model}.py`:
  * CLIP ViT-L/14-336 (quick-GELU, pre-LN blocks, class + learned positional
    embeddings, pre-layernorm) -- hidden states from layer -2, CLS dropped;
  * multi-modal projector (2-layer MLP) to the LLaVA text width;
  * AnyRes assembly for the fixed [[336, 672]] grid (1x2 patches ->
    24x48 feature grid), avg-pool 2x downsample, image-newline column,
    linear projection to the base-LLM width, temporal + camera encodings.

The fixed 1x2 pinpoint grid (reference llavanext.py:61) makes every shape
static, so the whole path jit-compiles into the training step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from simlingo_tpu.kernels.flash_attention import attention
from simlingo_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class CLIPViTConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    feature_layer: int = -2            # llava vision_feature_layer
    projector_hidden: int = 4096       # multi_modal_projector widths
    projector_out: int = 4096

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def tiny() -> "CLIPViTConfig":
        return CLIPViTConfig(hidden_size=64, num_layers=3, num_heads=4,
                             intermediate_size=128, image_size=56,
                             patch_size=14, projector_hidden=96,
                             projector_out=96)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def init_params(key, cfg: CLIPViTConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_layers + 4)
    H = cfg.hidden_size
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    n_pos = cfg.grid ** 2 + 1
    p: Dict[str, Any] = {
        "patch_embed": L.linear_init(keys[0], patch_dim, H, False, dtype),
        "cls_token": L._normal(keys[1], (H,), 0.02, dtype),
        "pos_embed": L._normal(keys[2], (n_pos, H), 0.02, dtype),
        "pre_ln": L.layernorm_init(H, dtype),
        "layers": {},
        "projector": {
            "fc1": L.linear_init(keys[3], H, cfg.projector_hidden, True, dtype),
            "fc2": L.linear_init(jax.random.fold_in(keys[3], 1),
                                 cfg.projector_hidden, cfg.projector_out,
                                 True, dtype),
        },
    }
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[i + 4], 6)
        p["layers"][str(i)] = {
            "ln1": L.layernorm_init(H, dtype),
            "ln2": L.layernorm_init(H, dtype),
            "attn": {
                "q": L.linear_init(k[0], H, H, True, dtype),
                "k": L.linear_init(k[1], H, H, True, dtype),
                "v": L.linear_init(k[2], H, H, True, dtype),
                "o": L.linear_init(k[3], H, H, True, dtype),
            },
            "mlp": L.gelu_mlp_init(k[4], H, cfg.intermediate_size, dtype),
        }
    return p


def _clip_layer(p, x, cfg: CLIPViTConfig):
    B, T, H = x.shape
    nh = cfg.num_heads
    hd = H // nh
    h = L.layernorm(p["ln1"], x, cfg.layer_norm_eps)
    q = L.linear(p["attn"]["q"], h).reshape(B, T, nh, hd)
    k = L.linear(p["attn"]["k"], h).reshape(B, T, nh, hd)
    v = L.linear(p["attn"]["v"], h).reshape(B, T, nh, hd)
    a = attention(q, k, v, None, causal=False)
    x = x + L.linear(p["attn"]["o"], a.reshape(B, T, H))
    h = L.layernorm(p["ln2"], x, cfg.layer_norm_eps)
    h = L.linear(p["mlp"]["fc1"], h)
    h = quick_gelu(h)
    h = L.linear(p["mlp"]["fc2"], h)
    return x + h


def encode(params, images: jnp.ndarray, cfg: CLIPViTConfig) -> jnp.ndarray:
    """[B, H, W, 3] -> hidden states of `feature_layer` [B, T+1, hidden]."""
    from simlingo_tpu.models.vit import _patchify

    class _Patch:  # reuse InternViT patchify with a CLIP-shaped config
        grid = cfg.grid
        patch_size = cfg.patch_size
    # match the policy-cast weight dtype (fp32 pixels would promote the tower)
    images = images.astype(params["patch_embed"]["w"].dtype)
    x = L.linear(params["patch_embed"], _patchify(images, _Patch))
    B = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype)[None, None],
                           (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)[None]
    x = L.layernorm(params["pre_ln"], x, cfg.layer_norm_eps)
    n_run = cfg.num_layers + cfg.feature_layer + 1 \
        if cfg.feature_layer < 0 else cfg.feature_layer
    for i in range(n_run):
        x = _clip_layer(params["layers"][str(i)], x, cfg)
    return x


def llava_features(params, pixel_values: jnp.ndarray, cfg: CLIPViTConfig,
                   newline: jnp.ndarray, downsample: int = 2) -> jnp.ndarray:
    """AnyRes 1x2 feature path.

    pixel_values [B, NP=2, S, S, 3] -> [B, n_tokens, projector_out] where
    n_tokens = (g/d) * (2g/d + 1) with the image-newline column appended.
    """
    B, NP = pixel_values.shape[:2]
    g = cfg.grid
    x = pixel_values.reshape((B * NP,) + pixel_values.shape[2:])
    feats = encode(params, x, cfg)[:, 1:]                    # drop CLS
    # projector
    h = L.linear(params["projector"]["fc1"], feats)
    h = jax.nn.gelu(h, approximate=False)
    h = L.linear(params["projector"]["fc2"], h)              # [B*NP, g*g, C]
    C = h.shape[-1]
    # assemble 1 row x NP cols grid: [B, g, NP*g, C]
    h = h.reshape(B, NP, g, g, C)
    h = h.transpose(0, 2, 1, 3, 4).reshape(B, g, NP * g, C)
    # avg-pool 2x
    d = downsample
    h = h.reshape(B, g // d, d, (NP * g) // d, d, C).mean(axis=(2, 4))
    # image-newline column
    nl = jnp.broadcast_to(newline.astype(h.dtype),
                          (B, h.shape[1], 1, C))
    h = jnp.concatenate([h, nl], axis=2)
    return h.reshape(B, -1, C)
