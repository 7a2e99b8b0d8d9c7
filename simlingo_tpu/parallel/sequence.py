"""Sequence parallelism: ring attention over an ``sp`` mesh axis.

The reference trains on <1.3k-token sequences and needs no sequence axis
(SURVEY.md sections 2.9/5.7) -- but a framework intended for production
deployment should not cap its context length at one chip's HBM. This module
adds the missing axis the TPU-native way:

  * activations are sharded along the SEQUENCE dimension over the ``sp``
    mesh axis; every elementwise op, layernorm, and matmul in the
    transformer stack is embarrassingly parallel along sequence, so XLA
    propagates the layout through the whole layer stack for free;
  * attention is the one op that mixes positions. ``ring_attention``
    computes it without ever materializing the full sequence on one chip:
    each device holds one contiguous KV chunk and the chunks rotate around
    the ring via ``ppermute`` (one ICI hop per step, sp-1 steps) while a
    running online-softmax accumulator (m, l, acc) folds in one chunk's
    scores per step -- the flash-attention recurrence, distributed. Compute
    overlaps the permute naturally (XLA schedules the collective-permute
    DMA concurrently with the chunk matmuls).
  * the ring is entered through a PARTIAL-MANUAL ``jax.shard_map``: manual
    over ``sp`` only, so dp/fsdp/tp sharding of the same tensors stays
    declarative (pjit chooses layouts; the ring code never sees those axes).

Degenerate cases route back to the fused single-chip Pallas kernel
automatically: ``kernels.flash_attention.attention`` consults
``active_axis()`` and only takes this path for cache-free self-attention
whose sequence length divides the sp axis (so KV-cached decode, the 1025
-token ViT, and tiny-T calls are untouched).

Causal note: with contiguous chunks, ring step s on device i is fully
masked when the incoming chunk index (i-s) mod sp exceeds i; those steps
early-out through ``lax.cond`` (the permute still runs -- the ring must
stay full), so the wasted-FLOP half of naive causal ring attention is
skipped rather than computed-and-discarded. Perfect load balance would
additionally need a zigzag chunk order (chunk pairing j, 2*sp-1-j); at the
model's current sequence lengths the cond-skip is within noise of it, and
the layout choice is orthogonal to this API.

Numerics match ``attention_reference`` (same NEG_INF masking, fp32
accumulation, zero rows for all-masked queries); grads flow through the
scan + ppermute transpose (tests/test_sequence_parallel.py pins fwd+bwd
parity on the 8-device CPU mesh).
"""

from __future__ import annotations

import contextlib
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30

# Module-level context: set by the trainer (or the `sequence_parallel`
# context manager in tests) BEFORE tracing the train step. Tracing bakes the
# routing decision in, exactly like the SIMLINGO_ATTN_IMPL env switch.
_STATE = {"mesh": None, "axis": None, "trace_count": 0}


def trace_count() -> int:
    """How many attention calls have traced through the ring since enable()
    (diagnostics: lets callers assert sp actually engaged rather than
    silently falling back on an indivisible sequence length)."""
    return _STATE["trace_count"]


def enable(mesh: Mesh, axis: str = "sp") -> None:
    """Route eligible attention calls through ring attention over `axis`.

    No-op (disable) when the mesh lacks the axis or it has size 1, so
    callers can pass their mesh unconditionally.
    """
    if axis in mesh.shape and mesh.shape[axis] > 1:
        _STATE.update(mesh=mesh, axis=axis, trace_count=0)
    else:
        disable()


def disable() -> None:
    _STATE["mesh"] = _STATE["axis"] = None


def active_axis() -> Optional[Tuple[Mesh, str, int]]:
    """(mesh, axis, size) when sequence parallelism is enabled, else None."""
    mesh, axis = _STATE["mesh"], _STATE["axis"]
    if mesh is None:
        return None
    return mesh, axis, mesh.shape[axis]


@contextlib.contextmanager
def sequence_parallel(mesh: Mesh, axis: str = "sp"):
    prev = dict(_STATE)
    enable(mesh, axis)
    try:
        yield
    finally:
        _STATE.update(prev)


# ---------------------------------------------------------------------------
# The ring (runs INSIDE shard_map: all shapes are per-shard)
# ---------------------------------------------------------------------------

def _chunk_update(acc, m, l, q32, k, v, mask):
    """Fold one KV chunk into the online-softmax state (flash recurrence).

    q32 [B,HQ,Tl,D] fp32 (scale pre-folded); k/v [B,Sl,HK,D]; mask
    [B,1,Tl,Sl] or [1,1,Tl,Sl]. Returns updated (acc, m, l).

    GQA runs as a grouped einsum against the UNEXPANDED k/v (query heads
    reshaped [B,HK,g,Tl,D]) -- repeating k/v to all HQ heads would multiply
    the per-ring-step KV traffic by the group factor, on exactly the
    HBM-limited long-context path this module exists for.
    """
    B, HQ, Tl, D = q32.shape
    HK = k.shape[2]
    g = HQ // HK
    qg = q32.reshape(B, HK, g, Tl, D)
    k32 = k.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    logits = jnp.einsum("bkgtd,bskd->bkgts", qg, k32).reshape(
        B, HQ, Tl, k.shape[1])
    logits = jnp.where(mask, logits, NEG_INF)
    m_new = jnp.maximum(m, logits.max(axis=-1))             # [B,HQ,Tl]
    # explicit where: when every key so far is masked, m_new == NEG_INF and
    # exp(NEG_INF - NEG_INF) would resurrect masked entries as 1.0
    p = jnp.where(mask, jnp.exp(logits - m_new[..., None]), 0.0)
    corr = jnp.exp(m - m_new)
    pv = jnp.einsum("bkgts,bskd->bkgtd",
                    p.reshape(B, HK, g, Tl, -1), v32).reshape(B, HQ, Tl, D)
    acc = acc * corr[..., None] + pv
    l = l * corr + p.sum(axis=-1)
    return acc, m_new, l


def _ring_body(q, k, v, kv_valid, *, axis: str, sp: int, causal: bool,
               scale: float):
    """Per-shard ring attention. q/k/v [B,Tl,H*,D], kv_valid [B,Tl] bool."""
    B, Tl, HQ, D = q.shape
    my = jax.lax.axis_index(axis)
    q32 = q.astype(jnp.float32).transpose(0, 2, 1, 3) * scale  # [B,HQ,Tl,D]
    q_pos = my * Tl + jnp.arange(Tl)                           # global slots

    # pcast-to-varying: the accumulators are per-shard state (varying over
    # the ring axis) from step 0, so both lax.cond branches agree on VMA type
    def _vary(x):
        return jax.lax.pcast(x, (axis,), to="varying")
    acc = _vary(jnp.zeros((B, HQ, Tl, D), jnp.float32))
    m = _vary(jnp.full((B, HQ, Tl), NEG_INF, jnp.float32))
    l = _vary(jnp.zeros((B, HQ, Tl), jnp.float32))
    perm = [(j, (j + 1) % sp) for j in range(sp)]

    def step(carry, s):
        acc, m, l, k, v, valid = carry
        src = (my - s) % sp                       # chunk index held this step
        kv_pos = src * Tl + jnp.arange(Tl)
        mask = valid[:, None, None, :]            # [B,1,1,Sl]
        if causal:
            mask = mask & (kv_pos[None, :] <= q_pos[:, None])[None, None]

        def compute(ops):
            return _chunk_update(*ops)

        def skip(ops):
            return ops[0], ops[1], ops[2]

        if causal:
            # chunk entirely in this shard's future => all-masked, skip the
            # matmuls (the permute below still runs; the ring stays full)
            fully_masked = src > my
            acc, m, l = jax.lax.cond(fully_masked, skip, compute,
                                     (acc, m, l, q32, k, v, mask))
        else:
            acc, m, l = compute((acc, m, l, q32, k, v, mask))

        k = jax.lax.ppermute(k, axis, perm)
        v = jax.lax.ppermute(v, axis, perm)
        valid = jax.lax.ppermute(valid, axis, perm)
        return (acc, m, l, k, v, valid), None

    (acc, m, l, *_), _ = jax.lax.scan(step, (acc, m, l, k, v, kv_valid),
                                      jnp.arange(sp))
    out = acc / jnp.maximum(l, 1e-30)[..., None]
    out = jnp.where((l > 0.0)[..., None], out, 0.0)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)           # [B,Tl,HQ,D]


# ---------------------------------------------------------------------------
# pjit-land entry point
# ---------------------------------------------------------------------------

def ring_attention(
    q: jnp.ndarray,                   # [B, T, HQ, D] (global shapes)
    k: jnp.ndarray,                   # [B, T, HK, D]
    v: jnp.ndarray,                   # [B, T, HK, D]
    kv_valid: Optional[jnp.ndarray],  # [B, T] bool or None
    causal: bool = True,
    scale: Optional[float] = None,
    mesh: Optional[Mesh] = None,
    axis: Optional[str] = None,
) -> jnp.ndarray:
    """Self-attention with the sequence dim sharded over `axis`.

    Semantics identical to ``attention_reference(q, k, v, kv_valid, causal)``
    for the self-attention case (T == S, no cache offset). Enters a
    shard_map that is manual over `axis` ONLY -- batch/head shardings on
    other mesh axes remain under pjit's control.
    """
    if mesh is None or axis is None:
        st = active_axis()
        assert st is not None, "ring_attention: no sp context; pass mesh+axis"
        mesh, axis, _ = st
    sp = mesh.shape[axis]
    B, T, HQ, D = q.shape
    assert T % sp == 0, f"seq {T} must divide sp={sp}"
    assert k.shape[1] == T and v.shape[1] == T, "self-attention only"
    if scale is None:
        scale = D ** -0.5
    if kv_valid is None:
        kv_valid = jnp.ones((B, T), bool)

    _STATE["trace_count"] += 1
    fn = jax.shard_map(
        lambda q_, k_, v_, valid_: _ring_body(
            q_, k_, v_, valid_, axis=axis, sp=sp, causal=causal,
            scale=scale),
        mesh=mesh,
        in_specs=(P(None, axis), P(None, axis), P(None, axis),
                  P(None, axis)),
        out_specs=P(None, axis),
        axis_names={axis},
    )
    return fn(q, k, v, kv_valid)
