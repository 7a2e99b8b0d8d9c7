"""SimLingo-Base (CarLLaVA): vision-only driving model.

Behavioral counterpart of reference `simlingo_base_training/models/driving.py`
(DrivingModel): vision encoder (LLaVA-NeXT CLIP tower or ResNet) -> linear
language_projection -> concat [vision tokens | speed token | target-point
tokens | 30 driving queries] -> from-scratch tiny LLaMA (continuous tokens,
no vocabulary) -> cumsum MLP heads; smooth-L1 losses. Used for the CARLA
Leaderboard 2.0 entry (no language IO).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from simlingo_tpu.core.structs import summarise_losses, TrainingOutput
from simlingo_tpu.models import adaptors as A
from simlingo_tpu.models import clip_vit, llama, qwen2, resnet
from simlingo_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class SimLingoBaseConfig:
    llm_variant: str = "tiny"
    encoder: str = "llavanext"           # 'llavanext' | 'resnet'
    clip: clip_vit.CLIPViTConfig = dataclasses.field(
        default_factory=clip_vit.CLIPViTConfig)
    resnet: resnet.ResNetConfig = dataclasses.field(
        default_factory=resnet.ResNetConfig)
    speed_as_input: bool = True
    predict_route_as_wps: bool = True
    speed_wps_mode: str = "2d"
    adaptor_mlp_dim: int = 256
    new_layer_norm_minmax: bool = False

    @property
    def llm(self) -> qwen2.Qwen2Config:
        return llama.llama_config(self.llm_variant)

    @property
    def speed_min_max(self) -> Tuple[float, float]:
        return (0.0, 110.0 / 3.6) if self.new_layer_norm_minmax \
            else (0.0, 64.0 / 3.6)

    @property
    def coord_min_max(self) -> Tuple[float, float]:
        return (-200.0, 200.0) if self.new_layer_norm_minmax else (-32.0, 32.0)

    @staticmethod
    def tiny() -> "SimLingoBaseConfig":
        return SimLingoBaseConfig(
            llm_variant="debug",
            clip=clip_vit.CLIPViTConfig.tiny())


def init_params(key, cfg: SimLingoBaseConfig, dtype=jnp.float32
                ) -> Dict[str, Any]:
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    llm_cfg = cfg.llm
    H = llm_cfg.hidden_size
    p: Dict[str, Any] = {
        "llm": qwen2.init_params(k1, llm_cfg, dtype),
        "adaptors": A.init_driving_adaptor(
            k2, H, cfg.adaptor_mlp_dim, cfg.speed_wps_mode,
            cfg.predict_route_as_wps, dtype),
        "route_encoder": A.init_wp_adaptor_base(k4, H, 256, dtype),
    }
    if cfg.speed_as_input:
        p["speed_encoder"] = A.init_vector_adaptor(k3, 1, H, 256, dtype)
    if cfg.encoder == "llavanext":
        p["vision"] = clip_vit.init_params(k5, cfg.clip, dtype)
        p["image_newline"] = 0.02 * jax.random.normal(
            k6, (cfg.clip.projector_out,), dtype)
        token_size = cfg.clip.projector_out
        p["temporal_encoding"] = 0.02 * jax.random.normal(
            jax.random.fold_in(k6, 1), (1, 1, token_size), dtype)
        p["camera_encoding"] = 0.02 * jax.random.normal(
            jax.random.fold_in(k6, 2), (1, 1, token_size), dtype)
    else:
        p["vision"], p["bn_state"] = resnet.init_params(k5, cfg.resnet, dtype)
        token_size = cfg.resnet.token_size
    if token_size != H:
        p["language_projection"] = L.linear_init(k7, token_size, H, False,
                                                 dtype)
    return p


def vision_tokens(params, pixel_values: jnp.ndarray,
                  cfg: SimLingoBaseConfig, training: bool = False
                  ) -> jnp.ndarray:
    """pixel_values [B, NP, S, S, 3] -> [B, n_tokens, H] projected tokens."""
    if cfg.encoder == "llavanext":
        feats = clip_vit.llava_features(params["vision"], pixel_values,
                                        cfg.clip, params["image_newline"])
        feats = feats + params["temporal_encoding"].astype(feats.dtype) \
            + params["camera_encoding"].astype(feats.dtype)
    else:
        B, NP = pixel_values.shape[:2]
        x = pixel_values.reshape((B * NP,) + pixel_values.shape[2:])
        feats, _ = resnet.encode(params["vision"], params["bn_state"], x,
                                 cfg.resnet, training=False)
        feats = feats.reshape(B, -1, feats.shape[-1])
    if "language_projection" in params:
        feats = L.linear(params["language_projection"], feats)
    return feats


def forward(params, pixel_values: jnp.ndarray, speed: jnp.ndarray,
            target_points: jnp.ndarray, cfg: SimLingoBaseConfig,
            training: bool = False) -> Dict[str, jnp.ndarray]:
    """Returns waypoint/route predictions.

    speed [B]; target_points [B, P, 2] (the reference feeds map_route = two
    target points, driving.py:196-219, 281-300).
    """
    vis = vision_tokens(params, pixel_values, cfg, training)
    B = vis.shape[0]
    parts = [vis]
    if cfg.speed_as_input:
        parts.append(A.vector_encode(params["speed_encoder"],
                                     speed[:, None].astype(vis.dtype),
                                     cfg.speed_min_max).astype(vis.dtype))
    parts.append(A.wp_encode_base(params["route_encoder"],
                                  target_points.astype(vis.dtype),
                                  cfg.coord_min_max))
    queries = A.query_tokens(params["adaptors"], B, dtype=vis.dtype)
    n_q = queries.shape[1]
    x = jnp.concatenate(parts + [queries], axis=1)
    T = x.shape[1]
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
    hidden, _ = qwen2.forward(params["llm"], x, cfg.llm, pos, causal=True)
    return A.decode_predictions(params["adaptors"], hidden[:, -n_q:])


def forward_loss(params, pixel_values, speed, target_points,
                 waypoints_label, route_label, cfg: SimLingoBaseConfig
                 ) -> Tuple[TrainingOutput, Dict[str, jnp.ndarray]]:
    vis = vision_tokens(params, pixel_values, cfg, training=True)
    B = vis.shape[0]
    parts = [vis]
    if cfg.speed_as_input:
        parts.append(A.vector_encode(params["speed_encoder"],
                                     speed[:, None].astype(vis.dtype),
                                     cfg.speed_min_max).astype(vis.dtype))
    parts.append(A.wp_encode_base(params["route_encoder"],
                                  target_points.astype(vis.dtype),
                                  cfg.coord_min_max))
    queries = A.query_tokens(params["adaptors"], B, dtype=vis.dtype)
    n_q = queries.shape[1]
    x = jnp.concatenate(parts + [queries], axis=1)
    T = x.shape[1]
    pos = jnp.tile(jnp.arange(T, dtype=jnp.int32)[None], (B, 1))
    hidden, _ = qwen2.forward(params["llm"], x, cfg.llm, pos, causal=True)
    losses, preds = A.driving_loss(
        params["adaptors"], hidden[:, -n_q:],
        route_label if cfg.predict_route_as_wps else None,
        waypoints_label[:, :A.NUM_SPEED_QUERIES])
    return summarise_losses(losses), preds
