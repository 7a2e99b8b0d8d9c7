"""InternViT vision tower (InternVL2-1B: InternViT-300M-448px), pure-functional JAX.

Behavioral counterpart of the reference's `model.extract_feature` path
(reference simlingo_training/models/encoder/internvl2_model.py:114 -> HF
remote code): ViT forward -> drop CLS -> 0.5x pixel shuffle -> mlp1 projector
to the LLM hidden size, yielding 256 tokens per 448x448 patch.

TPU-first details:
  * patch embedding as an explicit unfold + matmul (feeds the MXU directly;
    identical to a stride-14 conv);
  * NHWC image layout;
  * attention via the shared Pallas flash kernel (non-causal; padded seq
    1025 -> key-validity masks the padding);
  * layer scale (lambda1/lambda2), pre/post layernorm per InternViT.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax import ad_checkpoint

from simlingo_tpu.kernels.flash_attention import attention
from simlingo_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 448
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    layer_scale_init: float = 0.1
    qkv_bias: bool = True
    use_qk_norm: bool = False
    downsample_ratio: float = 0.5       # pixel shuffle scale
    projector_out: int = 896            # LLM hidden size (mlp1 output)
    # tanh-approximate GELU in the MLPs: ~16% faster ViT fwd+bwd on TPU
    # (the exact erf lowers to a long VPU polynomial). In bf16 compute the
    # approximation's max error (~3e-3 at |x|~2) is BELOW bf16 rounding
    # noise (~8e-3 there), so training is statistically identical; keep
    # False for fp32 HF-parity checks (HF 'gelu' is erf-based).
    gelu_approximate: bool = False

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def tokens_per_patch_image(self) -> int:
        """Image tokens emitted per input tile after pixel shuffle (256)."""
        return int(self.num_patches * self.downsample_ratio ** 2)

    @staticmethod
    def tiny() -> "ViTConfig":
        return ViTConfig(hidden_size=64, num_layers=2, num_heads=4,
                         intermediate_size=128, image_size=56, patch_size=14,
                         projector_out=64)


def init_params(key, cfg: ViTConfig, dtype=jnp.float32) -> Dict[str, Any]:
    keys = jax.random.split(key, cfg.num_layers + 3)
    H = cfg.hidden_size
    patch_dim = cfg.patch_size * cfg.patch_size * 3
    proj_in = int(H / (cfg.downsample_ratio ** 2))
    p: Dict[str, Any] = {
        "patch_embed": L.linear_init(keys[0], patch_dim, H, True, dtype),
        "cls_token": jnp.zeros((1, 1, H), dtype),
        "pos_embed": jnp.zeros((1, cfg.num_patches + 1, H), dtype),
        "layers": {},
        "projector": {
            "ln": L.layernorm_init(proj_in, dtype),
            "fc1": L.linear_init(keys[1], proj_in, cfg.projector_out, True, dtype),
            "fc2": L.linear_init(keys[2], cfg.projector_out, cfg.projector_out,
                                 True, dtype),
        },
    }
    for i in range(cfg.num_layers):
        k = jax.random.split(keys[i + 3], 6)
        p["layers"][str(i)] = {
            "ln1": L.layernorm_init(H, dtype),
            "ln2": L.layernorm_init(H, dtype),
            "attn": {
                "q": L.linear_init(k[0], H, H, cfg.qkv_bias, dtype),
                "k": L.linear_init(k[1], H, H, cfg.qkv_bias, dtype),
                "v": L.linear_init(k[2], H, H, cfg.qkv_bias, dtype),
                "o": L.linear_init(k[3], H, H, True, dtype),
            },
            "ls1": cfg.layer_scale_init * jnp.ones((H,), dtype),
            "ls2": cfg.layer_scale_init * jnp.ones((H,), dtype),
            "mlp": L.gelu_mlp_init(k[4], H, cfg.intermediate_size, dtype),
        }
        if cfg.use_qk_norm:
            p["layers"][str(i)]["q_norm"] = L.rmsnorm_init(H, dtype)
            p["layers"][str(i)]["k_norm"] = L.rmsnorm_init(H, dtype)
    return p


def _patchify(images: jnp.ndarray, cfg: ViTConfig) -> jnp.ndarray:
    """[B, H, W, 3] NHWC -> [B, num_patches, patch_size*patch_size*3].

    Flatten order per patch is (ph, pw, c), matching a torch conv kernel
    permuted OIHW -> (kh, kw, in, out) in the converter.
    """
    B, Him, Wim, C = images.shape
    g, ps = cfg.grid, cfg.patch_size
    x = images.reshape(B, g, ps, g, ps, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)          # [B, gh, gw, ph, pw, C]
    return x.reshape(B, g * g, ps * ps * C)


def _vit_layer(p, x, cfg: ViTConfig):
    B, T, H = x.shape
    nh = cfg.num_heads
    hd = H // nh

    h = L.layernorm(p["ln1"], x, cfg.layer_norm_eps)
    if cfg.use_qk_norm:
        q = L.linear(p["attn"]["q"], h)
        k = L.linear(p["attn"]["k"], h)
        v = L.linear(p["attn"]["v"], h)
        q = L.rmsnorm(p["q_norm"], q, cfg.layer_norm_eps)
        k = L.rmsnorm(p["k_norm"], k, cfg.layer_norm_eps)
        q = q.reshape(B, T, nh, hd)
        k = k.reshape(B, T, nh, hd)
        v = v.reshape(B, T, nh, hd)
        a = attention(q, k, v, None, causal=False)
        a = ad_checkpoint.checkpoint_name(a, "vit_attn_out")
        a = L.linear(p["attn"]["o"], a.reshape(B, T, H))
    elif hd == 64 and nh % 2 == 0:
        # lane-major attention: q/k/v stay [B, T, H] -- the linear's native
        # output -- and the kernel reads head pairs straight from the
        # matmul output lanes. No relayout ops AND no 2x HBM padding of a
        # 64-lane minor dim (flash_attention layout="bt_hd" notes).
        q = L.linear(p["attn"]["q"], h)
        k = L.linear(p["attn"]["k"], h)
        v = L.linear(p["attn"]["v"], h)
        a = attention(q, k, v, None, causal=False, layout="bt_hd",
                      num_heads=nh, scale=hd ** -0.5)
        a = ad_checkpoint.checkpoint_name(a, "vit_attn_out")
        a = L.linear(p["attn"]["o"], a)
    else:
        # head-major projections: the einsum fuses the [B,T,H*D]->[B,H,T,D]
        # relayout into the matmul's output write, and the kernel consumes
        # bhtd directly -- no separate transpose/copy ops per layer
        def proj(name):
            w = p["attn"][name]["w"].astype(h.dtype).reshape(H, nh, hd)
            y = jnp.einsum("btc,cnd->bntd", h, w)
            if "b" in p["attn"][name]:
                y = y + p["attn"][name]["b"].astype(h.dtype).reshape(
                    1, nh, 1, hd)
            return y
        q, k, v = proj("q"), proj("k"), proj("v")
        a = attention(q, k, v, None, causal=False, layout="bhtd")
        a = ad_checkpoint.checkpoint_name(a, "vit_attn_out")
        wo = p["attn"]["o"]["w"].astype(a.dtype).reshape(nh, hd, H)
        a = jnp.einsum("bntd,ndc->btc", a, wo)
        if "b" in p["attn"]["o"]:
            a = a + p["attn"]["o"]["b"].astype(a.dtype)
    x = x + p["ls1"].astype(a.dtype) * a

    h = L.layernorm(p["ln2"], x, cfg.layer_norm_eps)
    m = L.gelu_mlp(p["mlp"], h, approximate=cfg.gelu_approximate)
    return x + p["ls2"].astype(m.dtype) * m


def encode(params, images: jnp.ndarray, cfg: ViTConfig,
           remat=False) -> jnp.ndarray:
    """[B, H, W, 3] normalized images -> [B, T+1, hidden] ViT features."""
    # Match the compute dtype of the (policy-cast) weights: fp32 pixel
    # values would otherwise promote the whole tower to emulated-fp32
    # matmuls on the MXU (~3x slower + 2x activation memory).
    images = images.astype(params["patch_embed"]["w"].dtype)
    x = L.linear(params["patch_embed"], _patchify(images, cfg))
    B = x.shape[0]
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype),
                           (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"].astype(x.dtype)
    # remat=True recomputes each layer in the backward EXCEPT the attention
    # kernel's output (tagged above): re-running flash attention costs more
    # than storing its [B, T, H] result.
    # remat="mlp" is the surgical variant: save everything EXCEPT the GELU
    # output (tagged in layers.gelu_mlp) -- the backward recomputes one
    # elementwise GELU per layer from the saved pre-GELU hidden, freeing
    # half the MLP residual bytes (the dominant activation term) at ~zero
    # recompute FLOPs. Unlocks larger per-chip batches without paying the
    # full-tower recompute that remat=True costs (docs/BENCH_NOTES.md).
    if remat == "mlp":
        fn = jax.checkpoint(
            _vit_layer, static_argnums=(2,),
            policy=jax.checkpoint_policies.save_anything_except_these_names(
                "mlp_gelu_out"))
    elif remat:
        fn = jax.checkpoint(
            _vit_layer, static_argnums=(2,),
            policy=jax.checkpoint_policies.save_only_these_names(
                "vit_attn_out"))
    else:
        fn = _vit_layer
    for i in range(cfg.num_layers):
        x = fn(params["layers"][str(i)], x, cfg)
    return x


def pixel_shuffle(x: jnp.ndarray, scale: float) -> jnp.ndarray:
    """InternVL pixel shuffle, [B, W, H, C] -> [B, H*s, W*s, C/s^2].

    Matches HF InternVLModel.pixel_shuffle (view/permute sequence) exactly.
    """
    B, W, H, C = x.shape
    x = x.reshape(B, W, int(H * scale), int(C / scale))
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(B, int(H * scale), int(W * scale), int(C / (scale ** 2)))
    x = x.transpose(0, 2, 1, 3)
    return x


def extract_features(params, images: jnp.ndarray, cfg: ViTConfig,
                     remat=False) -> jnp.ndarray:
    """Full reference `extract_feature` path: ViT -> drop CLS -> pixel shuffle
    -> mlp1 projector. [B, H, W, 3] -> [B, tokens_per_patch_image, llm_hidden].
    """
    feats = encode(params, images, cfg, remat=remat)[:, 1:]       # drop CLS
    B, T, C = feats.shape
    g = cfg.grid
    feats = feats.reshape(B, g, g, C)
    feats = pixel_shuffle(feats, cfg.downsample_ratio)
    feats = feats.reshape(B, -1, feats.shape[-1])
    # projector (mlp1): LN -> fc1 -> GELU -> fc2
    h = L.layernorm(params["projector"]["ln"], feats, 1e-5)
    h = L.linear(params["projector"]["fc1"], h)
    h = jax.nn.gelu(h, approximate=False)
    return L.linear(params["projector"]["fc2"], h)
