"""The composed SimLingo VLA model: InternViT + Qwen2 + adaptors.

Behavioral counterpart of reference `simlingo_training/models/driving.py`
(DrivingModel) and `models/encoder/internvl2_model.py`
(replace_placeholder_tokens), re-designed for TPU:

  * hybrid sequence assembled with *static* ops: token embeddings, waypoint
    placeholder splicing (one-hot scatter over padded (slot, coord) lists),
    image-feature splicing (cumsum-gather over `<IMG_CONTEXT>` token
    positions -- works for right-padded training batches and left-padded
    inference batches alike), 30 driving-query tokens appended at the end;
  * position ids: text tokens use their slot index under right padding /
    cumsum(valid)-1 under left padding (provided by the collate); query
    tokens continue at n_valid + i, matching the reference's valid-first
    sort + arange positions (adaptors.py:322-330);
  * one jit-compiled forward for training; prefill + cached decode for
    inference lives in infer/runner.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from simlingo_tpu.core.structs import (DrivingExample, LanguageLabel,
                                       TrainingOutput, summarise_losses)
from simlingo_tpu.models import adaptors as A
from simlingo_tpu.models import qwen2, vit


@dataclasses.dataclass(frozen=True)
class SimLingoConfig:
    vit: vit.ViTConfig = dataclasses.field(default_factory=vit.ViTConfig)
    llm: qwen2.Qwen2Config = dataclasses.field(default_factory=qwen2.Qwen2Config)
    img_context_token_id: int = 151648   # <IMG_CONTEXT> in InternVL2-1B
    speed_wps_mode: str = "2d"
    predict_route_as_wps: bool = True
    adaptor_mlp_dim: int = 256
    freeze_vision: bool = False          # reference trains mlp1, freezes ViT optionally
    # False | True (full-layer, keep attention out) | "mlp" (recompute only
    # the MLP GELU -- vit.encode docstring)
    remat_vision: Any = True
    remat_llm: bool = True
    # CE computed on gathered (contiguous) answer positions; 0 => full-seq CE
    max_answer_len: int = 160

    @property
    def num_queries(self) -> int:
        return (A.NUM_ROUTE_QUERIES if self.predict_route_as_wps else 0) \
            + A.NUM_SPEED_QUERIES

    @staticmethod
    def tiny() -> "SimLingoConfig":
        return SimLingoConfig(
            vit=vit.ViTConfig.tiny(),
            llm=qwen2.Qwen2Config.tiny(),
            img_context_token_id=500,
            remat_vision=False, remat_llm=False)


def init_params(key, cfg: SimLingoConfig, dtype=jnp.float32) -> Dict[str, Any]:
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    p = {
        "vision": vit.init_params(k1, cfg.vit, dtype),
        "llm": qwen2.init_params(k2, cfg.llm, dtype),
        "adaptors": A.init_driving_adaptor(
            k3, cfg.llm.hidden_size, cfg.adaptor_mlp_dim,
            cfg.speed_wps_mode, cfg.predict_route_as_wps, dtype),
        "wp_encoder": A.init_wp_encoder(k4, cfg.llm.hidden_size, dtype),
    }
    if cfg.llm.lora_r > 0:
        p["lora"] = qwen2.init_lora_params(k5, cfg.llm, dtype)
    return p


# ---------------------------------------------------------------------------
# Sequence assembly
# ---------------------------------------------------------------------------

def build_text_embeddings(params: Dict[str, Any], label: LanguageLabel,
                          pixel_values: Optional[jnp.ndarray],
                          cfg: SimLingoConfig,
                          dtype=None) -> jnp.ndarray:
    """Token embeddings with waypoint + image features spliced in.

    pixel_values: [B, NP, H, W, 3] normalized; None => text only.
    Counterpart of reference replace_placeholder_tokens
    (internvl2_model.py:17-144).
    """
    ids = label.ids
    B, T = ids.shape
    embeds = qwen2.embed_tokens(params["llm"], ids, dtype=dtype)   # [B, T, H]

    # 1. waypoint-placeholder splicing (reference :53-91)
    ph_slots = label.ph_slots                                       # [B, P]
    ph_valid = ph_slots >= 0
    wp_embeds = A.wp_encode(params["wp_encoder"],
                            label.ph_coords.astype(embeds.dtype))   # [B, P, H]
    onehot = (ph_slots[:, :, None] == jnp.arange(T)[None, None, :]) \
        & ph_valid[:, :, None]                                      # [B, P, T]
    onehot_f = onehot.astype(embeds.dtype)
    spliced = jnp.einsum("bpt,bph->bth", onehot_f, wp_embeds)
    covered = onehot.any(axis=1)[..., None]                         # [B, T, 1]
    embeds = jnp.where(covered, spliced, embeds)

    # 2. image-feature splicing at <IMG_CONTEXT> positions (reference :94-132)
    if pixel_values is not None:
        if pixel_values.ndim == 4:
            # raw uint8 camera frames [B, H, W, 3]: fused on-device
            # preprocessing (crop/resize/normalize/tile) inside the step --
            # the north-star dataloader path (reference
            # internvl2_utils.py:179-267 runs this per-sample on CPU).
            from simlingo_tpu.data.image_pipe import (device_grid_for,
                                                      preprocess_device)
            grid = device_grid_for(pixel_values.shape[2],
                                   pixel_values.shape[1],
                                   cfg.vit.image_size)
            pixel_values = preprocess_device(
                pixel_values, cfg.vit.image_size, grid=grid)
        Bp, NP = pixel_values.shape[:2]
        imgs = pixel_values.reshape((B * NP,) + pixel_values.shape[2:])
        feats = vit.extract_features(params["vision"], imgs, cfg.vit,
                                     remat=cfg.remat_vision)        # [B*NP, n, H]
        if cfg.freeze_vision:
            feats = jax.lax.stop_gradient(feats)
        n_img = NP * feats.shape[1]
        feats = feats.reshape(B, n_img, -1).astype(embeds.dtype)
        img_mask = ids == cfg.img_context_token_id                  # [B, T]
        idx = jnp.clip(jnp.cumsum(img_mask, axis=1) - 1, 0, n_img - 1)
        gathered = jnp.take_along_axis(feats, idx[..., None], axis=1)
        embeds = jnp.where(img_mask[..., None], gathered, embeds)

    return embeds


def assemble_sequence(params, label: LanguageLabel,
                      pixel_values, cfg: SimLingoConfig, dtype=None
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full training sequence: [text | driving queries].

    Returns (embeds [B, T+Q, H], valid [B, T+Q], position_ids [B, T+Q]).
    """
    text = build_text_embeddings(params, label, pixel_values, cfg, dtype)
    B, T, H = text.shape
    queries = A.query_tokens(params["adaptors"], B, dtype=text.dtype)
    embeds = jnp.concatenate([text, queries], axis=1)

    valid = jnp.concatenate(
        [label.valid, jnp.ones((B, queries.shape[1]), bool)], axis=1)

    n_valid = label.num_valid                                        # [B]
    # text positions: slot index where tokens are contiguous-from-0 (right
    # padding) or cumsum(valid)-1 (left padding) -- both = cumsum-1 clipped.
    text_pos = jnp.clip(jnp.cumsum(label.valid, axis=1) - 1, 0, None)
    q_pos = n_valid[:, None] + jnp.arange(queries.shape[1])[None, :]
    position_ids = jnp.concatenate(
        [text_pos.astype(jnp.int32), q_pos.astype(jnp.int32)], axis=1)
    return embeds, valid, position_ids


# ---------------------------------------------------------------------------
# Training forward + loss
# ---------------------------------------------------------------------------

def forward_loss(params: Dict[str, Any], example: DrivingExample,
                 cfg: SimLingoConfig, dropout_rng: Optional[jax.Array] = None,
                 compute_dtype=jnp.float32
                 ) -> Tuple[TrainingOutput, Dict[str, jnp.ndarray]]:
    """Counterpart of reference DrivingModel.forward_loss (driving.py:236-261)."""
    di = example.driving_input
    label = di.prompt
    embeds, valid, pos = assemble_sequence(
        params, label, di.pixel_values, cfg, dtype=compute_dtype)
    B, TQ, H = embeds.shape
    T = label.ids.shape[1]

    hidden, _ = qwen2.forward(
        params["llm"], embeds, cfg.llm, pos, kv_valid=valid, causal=True,
        lora_params=params.get("lora"), remat=cfg.remat_llm,
        dropout_rng=dropout_rng)

    text_h = hidden[:, :T]
    query_h = hidden[:, T:]

    if cfg.max_answer_len > 0:
        hg, labels_g, valid_g = A.gather_answer_states(
            text_h, label.ids, label.loss_mask, cfg.max_answer_len)
        # tied-embedding LM head weight ([V, H], frozen) enables the fused
        # Pallas CE (SIMLINGO_CE_IMPL=pallas); quantized tables fall back
        emb = params["llm"]["embed"]
        head_w = None if ("lm_head" in params["llm"] or "w_q" in emb) \
            else emb["w"]
        losses = A.language_loss_gathered(
            hg, labels_g, valid_g,
            lambda h: qwen2.logits_from_hidden(params["llm"], h, cfg.llm),
            head_w=head_w)
    else:
        logits = qwen2.logits_from_hidden(params["llm"], text_h, cfg.llm)
        losses = A.language_loss(logits, label.ids, label.loss_mask)

    dl = example.driving_label
    route_label = dl.path if cfg.predict_route_as_wps else None
    if cfg.speed_wps_mode == "2d":
        speed_label = dl.waypoints[:, :A.NUM_SPEED_QUERIES]
    else:
        # 1d mode: cumulative arc length only (waypoints_1d stores [d, 0])
        speed_label = dl.waypoints_1d[:, :A.NUM_SPEED_QUERIES, :1]
    d_losses, preds = A.driving_loss(params["adaptors"], query_h,
                                     route_label, speed_label)
    losses.update(d_losses)
    return summarise_losses(losses), preds
