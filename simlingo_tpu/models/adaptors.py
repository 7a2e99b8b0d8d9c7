"""Driving/language adaptors: learned query tokens, decode heads, losses.

Behavioral counterpart of reference `simlingo_training/models/adaptors/
adaptors.py`:

  * DrivingAdaptor (reference :96-221): 20 learned route-query embeddings +
    10 speed-waypoint queries appended to the token sequence; MLP heads decode
    per-query deltas; `cumsum` over the query axis gives absolute waypoints;
    smooth-L1 loss summed over the coordinate dim.
  * WaypointInputAdaptor (reference :64-93): MLP 2 -> 256 -> 512 -> hidden
    turning coordinates into LLM-space embeddings for placeholder splicing.
  * LanguageAdaptor loss (reference :259-274): next-token CE, shift-by-1,
    assistant-only mask, ignore-index semantics.

TPU-first: everything is a pure function on static shapes; the reference's
valid-first permutation and python-side split bookkeeping are replaced by the
fixed [text | route queries | speed queries] layout (see core/structs.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from simlingo_tpu.models import layers as L

NUM_ROUTE_QUERIES = 20
NUM_SPEED_QUERIES = 10
IGNORE_INDEX = -1


def norm_zero_one(x: jnp.ndarray, min_max: Tuple[float, float]) -> jnp.ndarray:
    """Min-max normalize to [0, 1] (reference NormZeroOne, adaptors.py:37-44)."""
    return (x - min_max[0]) / (min_max[1] - min_max[0])


def init_vector_adaptor(key, input_size: int, token_size: int,
                        hidden_size: int = 256, dtype=jnp.float32):
    """Scalar/vector -> one token. Reference base VectorInputAdaptor
    (simlingo_base_training/models/adaptors/adaptors.py:75-111):
    Linear(in, hidden) -> ReLU -> Linear(hidden, token)."""
    return L.mlp_stack_init(key, [input_size, hidden_size, token_size],
                            dtype=dtype)


def vector_encode(p, x: jnp.ndarray,
                  min_max: Optional[Tuple[float, float]] = None) -> jnp.ndarray:
    """[B, input_size] -> [B, 1, token]."""
    if min_max is not None:
        x = norm_zero_one(x, min_max)
    return L.mlp_stack(p, x, jax.nn.relu)[:, None, :]


def init_wp_adaptor_base(key, token_size: int, hidden_size: int = 256,
                         dtype=jnp.float32):
    """Base-model waypoint/target-point token encoder (2 -> hidden -> token)."""
    return L.mlp_stack_init(key, [2, hidden_size, token_size], dtype=dtype)


def wp_encode_base(p, coords: jnp.ndarray,
                   min_max: Optional[Tuple[float, float]] = None) -> jnp.ndarray:
    if min_max is not None:
        coords = norm_zero_one(coords, min_max)
    return L.mlp_stack(p, coords, jax.nn.relu)


def init_driving_adaptor(key, hidden_size: int, mlp_dim: int = 256,
                         speed_wps_mode: str = "2d",
                         predict_route_as_wps: bool = True,
                         dtype=jnp.float32) -> Dict[str, Any]:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    out_dim = 2 if speed_wps_mode == "2d" else 1
    p: Dict[str, Any] = {}
    if predict_route_as_wps:
        p["route_queries"] = 0.02 * jax.random.normal(
            k1, (1, NUM_ROUTE_QUERIES, hidden_size), dtype)
        # reference route head: H -> 2*mlp -> mlp -> 2 (SiLU, last bias-free)
        p["route_head"] = L.mlp_stack_init(
            k2, [hidden_size, mlp_dim * 2, mlp_dim, 2],
            use_bias=[True, True, False], dtype=dtype)
    p["speed_queries"] = 0.02 * jax.random.normal(
        k3, (1, NUM_SPEED_QUERIES, hidden_size), dtype)
    # reference speed head: H -> mlp -> out (SiLU, last bias-free)
    p["speed_head"] = L.mlp_stack_init(
        k4, [hidden_size, mlp_dim, out_dim],
        use_bias=[True, False], dtype=dtype)
    return p


def init_wp_encoder(key, hidden_size: int, dtype=jnp.float32) -> Dict[str, Any]:
    """Waypoint-input MLP 2 -> 256 -> 512 -> hidden (ReLU), reference
    driving.py:91-96 (hidden_size=256, hidden_size2=512)."""
    return L.mlp_stack_init(key, [2, 256, 512, hidden_size], dtype=dtype)


def wp_encode(p: Dict[str, Any], coords: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] -> [..., hidden]."""
    return L.mlp_stack(p, coords, jax.nn.relu)


def query_tokens(p: Dict[str, Any], batch_size: int,
                 dtype=None) -> jnp.ndarray:
    """[B, 30, H] = [route queries | speed queries] (reference order,
    adaptors.py:117-136: 'route' first, then 'speed_wps')."""
    parts = []
    if "route_queries" in p:
        parts.append(jnp.broadcast_to(
            p["route_queries"], (batch_size,) + p["route_queries"].shape[1:]))
    parts.append(jnp.broadcast_to(
        p["speed_queries"], (batch_size,) + p["speed_queries"].shape[1:]))
    q = jnp.concatenate(parts, axis=1)
    if dtype is not None:
        q = q.astype(dtype)
    return q


def num_queries(p: Dict[str, Any]) -> int:
    n = NUM_SPEED_QUERIES
    if "route_queries" in p:
        n += NUM_ROUTE_QUERIES
    return n


def decode_predictions(p: Dict[str, Any], query_features: jnp.ndarray
                       ) -> Dict[str, jnp.ndarray]:
    """query_features [B, 30, H] -> {'route': [B,20,2], 'speed_wps': [B,10,d]}.

    Heads emit per-step deltas; cumsum over the step axis yields absolute
    waypoints (reference adaptors.py:163-180).
    """
    preds: Dict[str, jnp.ndarray] = {}
    idx = 0
    f = query_features.astype(jnp.float32)
    if "route_queries" in p:
        route_f = f[:, idx:idx + NUM_ROUTE_QUERIES]
        preds["route"] = L.mlp_stack(p["route_head"], route_f,
                                     jax.nn.silu).cumsum(axis=1)
        idx += NUM_ROUTE_QUERIES
    speed_f = f[:, idx:idx + NUM_SPEED_QUERIES]
    preds["speed_wps"] = L.mlp_stack(p["speed_head"], speed_f,
                                     jax.nn.silu).cumsum(axis=1)
    return preds


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (torch default beta=1.0)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def driving_loss(p: Dict[str, Any], query_features: jnp.ndarray,
                 route_label: Optional[jnp.ndarray],
                 speed_label: jnp.ndarray
                 ) -> Tuple[Dict[str, Tuple[jnp.ndarray, jnp.ndarray]],
                            Dict[str, jnp.ndarray]]:
    """Returns ({name: (loss [B,N], count [B,N])}, predictions)."""
    preds = decode_predictions(p, query_features)
    losses: Dict[str, Tuple[jnp.ndarray, jnp.ndarray]] = {}
    if "route" in preds and route_label is not None:
        l = smooth_l1(preds["route"], route_label.astype(jnp.float32)).sum(-1)
        losses["route_loss"] = (l, jnp.ones_like(l))
    l = smooth_l1(preds["speed_wps"], speed_label.astype(jnp.float32)).sum(-1)
    losses["speed_wps_loss"] = (l, jnp.ones_like(l))
    return losses, preds


def gather_answer_states(hidden: jnp.ndarray, ids: jnp.ndarray,
                         loss_mask: jnp.ndarray, max_answer_len: int
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather the hidden states that predict answer tokens.

    The chat template guarantees the loss region (assistant answer + final
    sep) is CONTIGUOUS (data/prompts.py), so per sample we slice
    [start-1, start-1+max_answer_len) where start is the first masked slot.
    This shrinks the 151k-vocab lm_head matmul + CE from T to max_answer_len
    positions (~6x fewer FLOPs, ~6x less logits memory at T=768).

    Returns (hidden_g [B, A, H], labels [B, A], valid [B, A]).
    """
    B, T, H = hidden.shape
    n_ans = loss_mask.sum(axis=1)                                 # [B]
    start = jnp.argmax(loss_mask, axis=1).astype(jnp.int32)       # first True
    offs = jnp.arange(max_answer_len, dtype=jnp.int32)[None, :]
    pred_idx = jnp.clip(start[:, None] - 1 + offs, 0, T - 1)      # [B, A]
    label_idx = jnp.clip(start[:, None] + offs, 0, T - 1)
    valid = offs < n_ans[:, None]
    hidden_g = jnp.take_along_axis(hidden, pred_idx[..., None], axis=1)
    labels = jnp.take_along_axis(ids, label_idx, axis=1)
    return hidden_g, labels, valid


def language_loss_gathered(hidden_g: jnp.ndarray, labels: jnp.ndarray,
                           valid: jnp.ndarray, logits_fn,
                           chunk: int = 32,
                           head_w: Optional[jnp.ndarray] = None
                           ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """CE over gathered answer positions (same semantics as language_loss).

    The logits tensor [B, A, 151674-vocab] in fp32 is the single largest
    HLO temp of the step (~740 MB at batch 8): it is never materialized.
    A lax.scan over `chunk`-token slices computes one [B, chunk, V] slab at
    a time, and the checkpointed body recomputes it in the backward -- the
    lm-head matmul is ~2% of step FLOPs, so the recompute is noise while
    the memory drops by A/chunk (x5 at the production answer length 160).

    head_w ([V, H] tied-embedding LM head): when given and
    SIMLINGO_CE_IMPL=pallas (frozen head) or pallas_dw (trainable head,
    streams the real dW per vocab tile), routes through
    kernels/fused_ce.py -- the vocab streams through VMEM with an online
    logsumexp, so even the [B, chunk, V] slabs never touch HBM and the
    weight is read exactly once per pass (the scan path reads/writes each
    fp32 slab thrice).
    """
    B, A, H = hidden_g.shape
    from simlingo_tpu.core import gates
    if head_w is not None and gates.ce_impl() in ("pallas", "pallas_dw"):
        from simlingo_tpu.kernels.fused_ce import fused_ce
        ce = fused_ce(hidden_g.reshape(B * A, H),
                      labels.reshape(B * A),
                      head_w.astype(hidden_g.dtype),
                      gates.ce_impl() == "pallas_dw")
        ce = ce.reshape(B, A)
        return {"language_loss": (jnp.where(valid, ce, 0.0), valid)}
    if chunk <= 0 or A <= chunk or A % chunk != 0:
        logits = logits_fn(hidden_g).astype(jnp.float32)          # [B, A, V]
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(
            logits, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
        ce = jnp.where(valid, logz - gold, 0.0)
        return {"language_loss": (ce, valid)}

    n = A // chunk
    hc = hidden_g.reshape(B, n, chunk, H).transpose(1, 0, 2, 3)
    lc = labels.reshape(B, n, chunk).transpose(1, 0, 2)
    vc = valid.reshape(B, n, chunk).transpose(1, 0, 2)

    @jax.checkpoint
    def body(_, xs):
        h, lab, val = xs
        logits = logits_fn(h).astype(jnp.float32)                 # [B, c, V]
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(
            logits, lab[..., None].astype(jnp.int32), axis=-1)[..., 0]
        return None, jnp.where(val, logz - gold, 0.0)

    _, ce = jax.lax.scan(body, None, (hc, lc, vc))                # [n, B, c]
    ce = ce.transpose(1, 0, 2).reshape(B, A)
    return {"language_loss": (ce, valid)}


def language_loss(logits: jnp.ndarray, ids: jnp.ndarray,
                  loss_mask: jnp.ndarray
                  ) -> Dict[str, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Next-token CE with assistant-only masking.

    logits [B, T, V] over text slots; labels = ids shifted by one; positions
    where loss_mask (on the *label* token) is False are ignored
    (reference adaptors.py:259-274: labels = where(mask, ids, -1)[:, 1:]).
    """
    logits = logits[:, :-1].astype(jnp.float32)
    labels = ids[:, 1:]
    mask = loss_mask[:, 1:]
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(
        logits, labels[..., None].astype(jnp.int32), axis=-1)[..., 0]
    ce = logz - gold
    ce = jnp.where(mask, ce, 0.0)
    return {"language_loss": (ce, mask)}
