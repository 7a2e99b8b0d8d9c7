"""Pallas TPU fused softmax cross-entropy over the LM head.

The gathered-answer CE (`models/adaptors.py language_loss_gathered`)
never materializes the full [B, A, V] logits, but its lax.scan chunks
still write each [B, chunk, V] fp32 slab to HBM and read it back twice
(logsumexp + label gather) -- the round-4 trace attributes ~11 ms/step
to the CE while-loops and slab fusions, ~7 ms of which is that HBM
round-trip plus a [V, H] -> [H, V] relayout copy of the tied embedding.

This kernel streams the vocabulary in VMEM tiles with an online
(max, sumexp) accumulator -- flash attention's trick applied to the
classifier -- so per step the weight matrix is read exactly once
forward and once backward, and no logits ever touch HBM:

  fwd:  logits_tile = h @ W_tile^T            (MXU, fp32 accumulate)
        m, l <- online max / scaled sumexp    (VPU)
        gold <- sum(logits_tile * onehot)     (VPU; labels vs col ids)
        ce = (m + log l) - gold
  bwd:  p_tile = exp(logits_tile - logz)      (recompute, no residual)
        dh += (p_tile - onehot) * g @ W_tile  (MXU)

In the production config the LM head is the FROZEN tied embedding
([V, H], base LLM under LoRA -- reference peft config), so only dh flows
and dW is skipped (the custom VJP returns a symbolic zero for W). For
full-finetune (trainable tied embedding) pass ``compute_dw=True``
(SIMLINGO_CE_IMPL=pallas_dw): the backward then also emits per-tile
  dW_tile = dlogits_tile^T @ h                 (MXU, [BV, H])
written blocked over the vocab grid -- no cross-tile accumulation, the
weight's gradient costs one extra matmul per tile (~2x the CE backward,
still logits-free).

Reference counterpart: plain `F.cross_entropy` over full logits inside
HF modeling code (simlingo_training/models/adaptors.py language head).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _col_ids(j, block_v: int, shape):
    # [rows, block_v] global column ids of this vocab tile (2D iota: TPU
    # rejects 1D iota)
    return jax.lax.broadcasted_iota(jnp.int32, shape, 1) + j * block_v


def _fwd_kernel(h_ref, w_ref, lab_ref, m_ref, l_ref, gold_ref,
                *, block_v: int, vocab: int):
    j = pl.program_id(0)
    h = h_ref[...]                                     # [N, H] bf16
    w = w_ref[...]                                     # [BV, H] bf16
    logits = jax.lax.dot_general(
        h, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [N, BV]
    cols = _col_ids(j, block_v, logits.shape)
    logits = jnp.where(cols < vocab, logits, -jnp.inf)  # mask pad columns

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        gold_ref[...] = jnp.zeros_like(gold_ref)

    m_prev = m_ref[...]                                # [N, 1]
    m_new = jnp.maximum(m_prev, logits.max(axis=1, keepdims=True))
    # first tile: m_prev = -inf and l = 0, exp(-inf - m) * 0 handled by
    # where to avoid nan from exp(-inf + inf)
    scale = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
    l_ref[...] = l_ref[...] * scale + jnp.exp(
        logits - m_new).sum(axis=1, keepdims=True)
    m_ref[...] = m_new
    onehot = cols == lab_ref[...]                      # [N, BV] vs [N, 1]
    gold_ref[...] += jnp.where(onehot, logits, 0.0).sum(
        axis=1, keepdims=True)


def _bwd_kernel(h_ref, w_ref, lab_ref, logz_ref, g_ref, dh_ref, *dw_ref,
                block_v: int, vocab: int):
    j = pl.program_id(0)
    h = h_ref[...]
    # zero the padded rows of the boundary W tile: dlogits is 0 there, but
    # 0 * undefined-pad would still poison the dh matmul if the pad is NaN
    row_ok = jax.lax.broadcasted_iota(
        jnp.int32, w_ref.shape, 0) + j * block_v < vocab
    w = jnp.where(row_ok, w_ref[...], jnp.zeros((), w_ref.dtype))
    logits = jax.lax.dot_general(
        h, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [N, BV]
    cols = _col_ids(j, block_v, logits.shape)
    p = jnp.where(cols < vocab, jnp.exp(logits - logz_ref[...]), 0.0)
    onehot = (cols == lab_ref[...]).astype(jnp.float32)
    dlogits = (p - onehot) * g_ref[...]                # [N, BV] * [N, 1]

    @pl.when(j == 0)
    def _init():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    dh_ref[...] += jax.lax.dot_general(
        dlogits.astype(w.dtype), w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [N, H]
    if dw_ref:
        # full-finetune path: this grid step owns vocab rows [j*BV, (j+1)*BV)
        # exclusively, so the tile is written once -- no revisiting, no
        # accumulator. dlogits is already 0 on pad columns.
        dw_ref[0][...] = jax.lax.dot_general(
            dlogits.astype(h.dtype), h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # [BV, H]


def _run_fwd(h2, labels, w, block_v: int):
    N, H = h2.shape
    V = w.shape[0]
    grid = (pl.cdiv(V, block_v),)
    m, l, gold = pl.pallas_call(
        functools.partial(_fwd_kernel, block_v=block_v, vocab=V),
        grid=grid,
        in_specs=[pl.BlockSpec((N, H), lambda j: (0, 0)),
                  pl.BlockSpec((block_v, H), lambda j: (j, 0)),
                  pl.BlockSpec((N, 1), lambda j: (0, 0))],
        out_specs=[pl.BlockSpec((N, 1), lambda j: (0, 0)),
                   pl.BlockSpec((N, 1), lambda j: (0, 0)),
                   pl.BlockSpec((N, 1), lambda j: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((N, 1), jnp.float32)] * 3,
        interpret=_interpret(),
    )(h2, w, labels.reshape(N, 1).astype(jnp.int32))
    logz = m[:, 0] + jnp.log(l[:, 0])
    return logz, gold[:, 0]


def _run_bwd(h2, labels, w, logz, g, block_v: int, compute_dw: bool):
    N, H = h2.shape
    V = w.shape[0]
    grid = (pl.cdiv(V, block_v),)
    out_specs = [pl.BlockSpec((N, H), lambda j: (0, 0))]
    out_shape = [jax.ShapeDtypeStruct((N, H), jnp.float32)]
    if compute_dw:
        out_specs.append(pl.BlockSpec((block_v, H), lambda j: (j, 0)))
        out_shape.append(jax.ShapeDtypeStruct((V, H), jnp.float32))
    out = pl.pallas_call(
        functools.partial(_bwd_kernel, block_v=block_v, vocab=V),
        grid=grid,
        in_specs=[pl.BlockSpec((N, H), lambda j: (0, 0)),
                  pl.BlockSpec((block_v, H), lambda j: (j, 0)),
                  pl.BlockSpec((N, 1), lambda j: (0, 0)),
                  pl.BlockSpec((N, 1), lambda j: (0, 0)),
                  pl.BlockSpec((N, 1), lambda j: (0, 0))],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(h2, w, labels.reshape(N, 1).astype(jnp.int32),
      logz.reshape(N, 1).astype(jnp.float32), g.reshape(N, 1))
    return (out[0], out[1]) if compute_dw else (out[0], None)


def _pick_block_v(N: int, H: int, vocab: int,
                  compute_dw: bool = False) -> int:
    # VMEM budget ~12 MB: h (2B) + dh acc (4B) resident [N, H], two W tiles
    # (double-buffered, 2B) and two [N, BV] fp32 intermediates per tile;
    # the dW path adds a double-buffered fp32 [BV, H] output tile
    resident = N * H * 6
    per_bv = 2 * H * 2 + 2 * N * 4
    if compute_dw:
        per_bv += 2 * H * 4
    bv = (12 * 1024 * 1024 - resident) // per_bv
    bv = max(512, min(8192, bv // 512 * 512))
    return min(bv, -(-vocab // 512) * 512)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_ce(h2: jnp.ndarray, labels: jnp.ndarray, w: jnp.ndarray,
             compute_dw: bool = False) -> jnp.ndarray:
    """Per-row softmax cross-entropy of rows h2 [N, H] against the tied
    LM head w [V, H]: returns ce [N] fp32 = logz - gold.

    ``compute_dw=False`` (production: frozen tied embedding) returns a
    symbolic-zero cotangent for w; ``compute_dw=True`` streams the real
    dW = dlogits^T @ h per vocab tile for full-finetune.

    Rows with out-of-range labels still get a finite logz (their gold sums
    zero contributions) -- callers mask invalid rows themselves, matching
    language_loss_gathered's `valid` handling.
    """
    ce, _ = _fused_ce_fwd(h2, labels, w, compute_dw)
    return ce


def _fused_ce_fwd(h2, labels, w, compute_dw):
    block_v = _pick_block_v(h2.shape[0], h2.shape[1], w.shape[0])
    logz, gold = _run_fwd(h2, labels, w, block_v)
    return logz - gold, (h2, labels, w, logz)


def _fused_ce_bwd(compute_dw, res, g):
    h2, labels, w, logz = res
    block_v = _pick_block_v(h2.shape[0], h2.shape[1], w.shape[0],
                            compute_dw)
    dh, dw = _run_bwd(h2, labels, w, logz, g.astype(jnp.float32), block_v,
                      compute_dw)
    if dw is None:
        # frozen tied embedding: the training partition never routes a grad
        # into w; a symbolic zero keeps that contract explicit and cheap
        dw = jnp.zeros_like(w)
    return dh.astype(h2.dtype), None, dw.astype(w.dtype)


fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)
