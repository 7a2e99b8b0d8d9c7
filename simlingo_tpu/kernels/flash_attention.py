"""Pallas TPU flash attention (fwd + bwd) for SimLingo-TPU.

Replaces the reference's flash-attn-2 CUDA dependency (SURVEY.md section 2.10,
reference README.md:68) with a TPU-native fused kernel.

Semantics tailored to the framework's *static hybrid-sequence layout*:

  * slot-order causality: query at slot i attends to keys at slots <= i
    (our collate guarantees valid text tokens are contiguous from slot 0 and
    driving-query tokens follow them, so slot order == effective position
    order; see core/structs.py docstring);
  * key-validity masking: padded key slots are excluded via a boolean
    ``kv_valid`` array -- together these reproduce the reference's
    left-pad + valid-first-sort attention mask exactly;
  * grouped-query attention (Qwen2-0.5B: 14 query heads / 2 kv heads);
  * fp32 softmax statistics, bf16 throughput on the MXU.

TPU layout notes:
  * softmax log-sum-exp is stored as [B, H, 8, T] (stats broadcast over the
    8-sublane dim) to satisfy the (8, 128) tile constraint -- same trick as
    jax's bundled kernel which uses a 128-lane broadcast;
  * the backward pass recomputes delta = rowsum(dO * O) inside the kernels
    from the saved output, avoiding an HBM round-trip for a broadcast array.

The public entrypoint :func:`attention` dispatches to the Pallas kernel on
TPU and to a jnp reference implementation elsewhere (CPU tests, debugging).
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
STAT_SUBLANES = 8


def _scoped_vmem_limit_kib() -> int:
    """The compiler's scoped-VMEM budget for a kernel's stack (KiB).

    XLA:TPU defaults to 16 MiB, far below v5e's 128 MB physical VMEM;
    production entry points raise it via
    ``--xla_tpu_scoped_vmem_limit_kib`` (see bench.py) so the backward's
    proven single-kv-block path survives small staging shifts and stays
    available at batch >= 7. The block-size heuristics below scale their
    empirically calibrated cuts by this limit."""
    import re
    m = re.search(r"--xla_tpu_scoped_vmem_limit_kib=(\d+)",
                  os.environ.get("LIBTPU_INIT_ARGS", "")
                  + " " + os.environ.get("XLA_FLAGS", ""))
    return int(m.group(1)) if m else 16384
LOG2E = 1.4426950408889634  # softmax runs in base 2 (exp2 is the native
                            # VPU transcendental; exp lowers to exp2 + mul)


def _interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU tests)."""
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Reference implementation (identical semantics, pure XLA)
# ---------------------------------------------------------------------------

def attention_reference(
    q: jnp.ndarray,                     # [B, T, HQ, D]
    k: jnp.ndarray,                     # [B, S, HK, D]
    v: jnp.ndarray,                     # [B, S, HK, D]
    kv_valid: Optional[jnp.ndarray],    # [B, S] bool or None
    causal: bool,
    scale: Optional[float] = None,
    q_offset: Optional[jnp.ndarray] = None,  # scalar: global slot of q row 0
) -> jnp.ndarray:
    B, T, HQ, D = q.shape
    _, S, HK, _ = k.shape
    group = HQ // HK
    if scale is None:
        scale = D ** -0.5
    if q_offset is None:
        q_offset = S - T  # end-aligned (the no-cache case: T == S => 0)
    qf = q.astype(jnp.float32) * scale
    kf = jnp.repeat(k.astype(jnp.float32), group, axis=2)
    vf = jnp.repeat(v.astype(jnp.float32), group, axis=2)
    logits = jnp.einsum("bthd,bshd->bhts", qf, kf)
    mask = jnp.ones((B, 1, T, S), dtype=bool)
    if causal:
        q_slot = jnp.arange(T)[:, None] + q_offset
        kv_slot = jnp.arange(S)[None, :]
        mask = mask & (kv_slot <= q_slot)[None, None]
    if kv_valid is not None:
        mask = mask & kv_valid[:, None, None, :]
    logits = jnp.where(mask, logits, NEG_INF)
    m = logits.max(axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    l = p.sum(axis=-1, keepdims=True)
    p = p / jnp.maximum(l, 1e-30)
    out = jnp.einsum("bhts,bshd->bthd", p, vf)
    # rows with no valid key produce zeros
    any_valid = mask.any(axis=-1)                       # [B, H, T]
    out = out * any_valid.transpose(0, 2, 1)[..., None]
    return out.astype(q.dtype)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(off_ref, q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref,
                *, scale2: float, causal: bool, block_q: int, block_k: int,
                kv_len: int):
    # off_ref: [1, 1] int32 SMEM (global slot of q row 0)
    # q_ref: [1, 1, bq, D]; k/v_ref: [1, 1, S, D]; valid_ref: [1, 1, S] int32
    # o_ref: [1, 1, bq, D]; lse_ref: [1, 1, STAT_SUBLANES, bq] (BASE-2 lse)
    qi = pl.program_id(2)
    off = off_ref[0, 0]
    # MXU operands stay in the input dtype (bf16 in production): fp32 matmuls
    # are emulated in multiple passes on TPU. The base-2 scale (softmax runs
    # on exp2, the native VPU transcendental; exp would lower to exp2 + a
    # per-element multiply) is folded into q: D multiplies/row beat bq*bk
    # multiplies on the scores.
    q = q_ref[0, 0]                                      # [bq, D]
    q = (q.astype(jnp.float32) * scale2).astype(q.dtype)
    bq, D = q.shape
    nk = kv_len // block_k

    if causal:
        q_slot = off + qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (bq, block_k), 0)
        # last kv block that can contain an unmasked key for this q block
        last = (off + qi * block_q + bq - 1) // block_k + 1
        nk_eff = jnp.clip(last, 0, nk)
        # leading blocks whose every key slot <= every q slot skip the
        # per-element slot compare entirely
        j_full = jnp.clip((off + qi * block_q - block_k + 1) // block_k + 1,
                          0, nk_eff)
    else:
        nk_eff = nk
        j_full = nk

    def body(j, carry, masked):
        acc, m_prev, l_prev = carry
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k)]
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                            # [bq, bk]
        # VPU economy: key validity as an additive [bk] bias (one add/elem);
        # masked entries sit at ~-1e30 so exp2(s - m_new) underflows to exact
        # zero for any row with >= 1 valid key. (Rows with NO valid key --
        # left-pad query slots at inference -- produce finite garbage that
        # downstream never reads and whose cotangents are zero.)
        bias = jnp.where(
            valid_ref[0, 0, pl.ds(j * block_k, block_k)] != 0, 0.0, NEG_INF)
        s = s + bias[None, :]
        if masked:
            kv_slot = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (bq, block_k), 1)
            s = jnp.where(kv_slot <= q_slot, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)                                        # [bq]
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new[:, None])
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, D), jnp.float32)
    m0 = jnp.full((bq,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    if not causal:
        # static trip count: python-unroll so Mosaic can interleave block
        # j+1's MXU matmul with block j's VPU softmax (a fori_loop body is
        # scheduled as an opaque sequential region)
        carry = (acc0, m0, l0)
        for j in range(nk):
            carry = body(j, carry, masked=False)
    else:
        carry = jax.lax.fori_loop(0, j_full,
                                  functools.partial(body, masked=False),
                                  (acc0, m0, l0))
        carry = jax.lax.fori_loop(j_full, nk_eff,
                                  functools.partial(body, masked=True),
                                  carry)
    acc, m, l = carry

    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe[:, None]).astype(o_ref.dtype)
    # base-2 log-sum-exp; rows with zero mass get NEG_INF => exp2(s-lse)==0
    lse = jnp.where(l > 0, m + jnp.log2(l_safe), NEG_INF)                  # [bq]
    lse_ref[0, 0] = jnp.broadcast_to(lse[None, :], (STAT_SUBLANES, bq))


# ---------------------------------------------------------------------------
# Backward kernels
# ---------------------------------------------------------------------------

def _bwd_kernel(off_ref, q_ref, k_ref, v_ref, valid_ref, o_ref, do_ref,
                lse_ref, dq_ref, dk_ref, dv_ref, *, scale: float,
                scale2: float, causal: bool, block_q: int, block_k: int,
                q_len: int):
    """Fused backward: one pass over kv blocks computing dq, dk, dv.

    Grid (B, HQ, nk). dq uses a *revisited* full-T accumulator block (same
    block index for every kv step, zeroed at ki == 0) so a single kernel
    produces all three gradients -- one recompute of p per (q, kv) block pair
    instead of two, and no concurrently-scheduled sibling kernels.

    lse is base-2 (see _fwd_kernel): p recomputed as exp2(scale2*(q.k) + bias
    - lse2) equals the forward softmax exactly; ds -> dq/dk use the
    natural-log scale (the chain rule through softmax is base-free).
    """
    ki = pl.program_id(2)
    off = off_ref[0, 0]
    kb = k_ref[0, 0]                                                      # [bk, D]
    vb = v_ref[0, 0]
    bk, D = kb.shape
    nq = q_len // block_q

    @pl.when(ki == 0)
    def _():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])

    kv_bias = jnp.where(valid_ref[0, 0, pl.ds(ki * block_k, bk)] != 0,
                        0.0, NEG_INF)                                      # [bk]
    if causal:
        kv_slot = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, bk), 1)
        # first q block with any unmasked entry for this kv block
        first = jnp.clip((ki * block_k - off) // block_q, 0, nq)
        # first q block where every q slot >= every kv slot: no compare
        j_clear = jnp.clip(-((off - ki * block_k - block_k + 1) // block_q),
                           first, nq)
    else:
        first = 0
        j_clear = 0                       # all blocks take the no-mask loop

    def body(j, carry, masked):
        dk, dv = carry
        # MXU operands in the input dtype (bf16): fp32 dots are emulated.
        qb = q_ref[0, 0, pl.ds(j * block_q, block_q)]                      # [bq, D]
        dob = do_ref[0, 0, pl.ds(j * block_q, block_q)]
        ob = o_ref[0, 0, pl.ds(j * block_q, block_q)]
        delta = (dob.astype(jnp.float32) * ob.astype(jnp.float32)).sum(axis=-1)
        lse = lse_ref[0, 0, 0, pl.ds(j * block_q, block_q)]                # [bq]
        s = scale2 * jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        s = s + kv_bias[None, :]
        if masked:
            q_slot = off + j * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, bk), 0)
            s = jnp.where(kv_slot <= q_slot, s, NEG_INF)
        # exp2(-huge - lse) underflows to exact zero => masked entries drop out
        p = jnp.exp2(s - lse[:, None])                                     # [bq, bk]
        pc = p.astype(kb.dtype)
        dv = dv + jax.lax.dot_general(
            pc, dob, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            dob, vb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None])).astype(kb.dtype)
        dk = dk + scale * jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dq_upd = scale * jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        sl = pl.ds(j * block_q, block_q)
        dq_ref[0, 0, sl] = (dq_ref[0, 0, sl].astype(jnp.float32)
                            + dq_upd).astype(dq_ref.dtype)
        return dk, dv

    dk0 = jnp.zeros((bk, D), jnp.float32)
    dv0 = jnp.zeros((bk, D), jnp.float32)
    carry = (dk0, dv0)
    if causal:
        carry = jax.lax.fori_loop(first, j_clear,
                                  functools.partial(body, masked=True), carry)
        dk, dv = jax.lax.fori_loop(j_clear, nq,
                                   functools.partial(body, masked=False),
                                   carry)
    else:
        # static trip count: python-unroll for MXU/VPU interleaving across
        # blocks (see _fwd_kernel)
        for j in range(nq):
            carry = body(j, carry, masked=False)
        dk, dv = carry
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# GQA-packed kernels: all `group` query heads sharing one kv head run in ONE
# grid program. Wins vs the per-q-head grid (the LLM is 14 q / 2 kv heads):
#   * the kv block is DMA'd once per program instead of `group` times;
#   * the score matmul batches group*block_q rows onto the MXU (M=896 vs 128);
#   * dk/dv accumulate over the group INSIDE the kernel -- no [B, HQ, S, D]
#     expanded gradient buffers and no group-reduce pass afterwards.
# Layout: q viewed as [B, HK, group, T, D] (a FREE reshape of [B, HQ, T, D]
# when heads are kv-major, the standard GQA order). Every packed tile spans
# the SAME slot range across the group, so causal pruning bounds stay uniform.
# ---------------------------------------------------------------------------

def _fwd_kernel_gqa(off_ref, q_ref, k_ref, v_ref, valid_ref, o_ref, lse_ref,
                    *, scale2: float, causal: bool, block_q: int,
                    block_k: int, kv_len: int, group: int):
    # q_ref: [1, 1, G, bq, D]; k/v_ref: [1, 1, S, D]; valid_ref: [1, 1, S]
    # o_ref: [1, 1, G, bq, D]; lse_ref: [1, 1, G, STAT_SUBLANES, bq]
    qi = pl.program_id(2)
    off = off_ref[0, 0]
    q = q_ref[0, 0]                                       # [G, bq, D]
    G, bq, D = q.shape
    q = (q.astype(jnp.float32) * scale2).astype(q_ref.dtype)
    q = q.reshape(G * bq, D)
    nk = kv_len // block_k
    rows = G * bq

    if causal:
        # slot of packed row r = off + qi*bq + (r mod bq): uniform range
        # [base, base+bq) across the group
        row_slot = off + qi * block_q + jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0), bq)
        last = (off + qi * block_q + bq - 1) // block_k + 1
        nk_eff = jnp.clip(last, 0, nk)
        j_full = jnp.clip((off + qi * block_q - block_k + 1) // block_k + 1,
                          0, nk_eff)
    else:
        nk_eff = nk
        j_full = nk

    def body(j, carry, masked):
        acc, m_prev, l_prev = carry
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k)]
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k)]
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)            # [G*bq, bk]
        bias = jnp.where(
            valid_ref[0, 0, pl.ds(j * block_k, block_k)] != 0, 0.0, NEG_INF)
        s = s + bias[None, :]
        if masked:
            kv_slot = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (rows, block_k), 1)
            s = jnp.where(kv_slot <= row_slot, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new[:, None])
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((rows, D), jnp.float32)
    m0 = jnp.full((rows,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows,), jnp.float32)
    carry = jax.lax.fori_loop(0, j_full,
                              functools.partial(body, masked=False),
                              (acc0, m0, l0))
    if causal:
        carry = jax.lax.fori_loop(j_full, nk_eff,
                                  functools.partial(body, masked=True),
                                  carry)
    acc, m, l = carry

    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0, 0] = (acc / l_safe[:, None]).reshape(G, bq, D).astype(
        o_ref.dtype)
    # lse stored PACKED-FLAT [STAT, G*T_tilemajor]: row p = qi*(G*bq) +
    # g*bq + r -- the backward (same q tiling) reads it as a plain 1-D lane
    # slice, no shape casts Mosaic might reject
    lse = jnp.where(l > 0, m + jnp.log2(l_safe), NEG_INF)     # [G*bq]
    lse_ref[0, 0] = jnp.broadcast_to(lse[None, :],
                                     (STAT_SUBLANES, rows))


def _bwd_kernel_gqa(off_ref, q_ref, k_ref, v_ref, valid_ref, o_ref, do_ref,
                    lse_ref, dq_ref, dk_ref, dv_ref, *, scale: float,
                    scale2: float, causal: bool, block_q: int, block_k: int,
                    q_len: int, group: int):
    """GQA-packed fused backward, grid (B, HK, nk): each program owns one kv
    block and loops over slot-aligned [group, block_q] q tiles; dk/dv are
    group-accumulated locally and written ONCE at kv-head granularity.
    block_q MUST equal the forward's (the packed-flat lse tiling assumes it).
    lse_ref: [1, 1, STAT_SUBLANES, G*T] packed as in _fwd_kernel_gqa."""
    ki = pl.program_id(2)
    off = off_ref[0, 0]
    kb = k_ref[0, 0]                                       # [bk, D]
    vb = v_ref[0, 0]
    bk, D = kb.shape
    nq = q_len // block_q
    G = group
    rows = G * block_q

    @pl.when(ki == 0)
    def _():
        dq_ref[0, 0] = jnp.zeros_like(dq_ref[0, 0])

    kv_bias = jnp.where(valid_ref[0, 0, pl.ds(ki * block_k, bk)] != 0,
                        0.0, NEG_INF)
    if causal:
        kv_slot = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (rows, bk), 1)
        first = jnp.clip((ki * block_k - off) // block_q, 0, nq)
        j_clear = jnp.clip(-((off - ki * block_k - block_k + 1) // block_q),
                           first, nq)
    else:
        first = 0
        j_clear = 0

    def body(j, carry, masked):
        dk, dv = carry
        sl = pl.ds(j * block_q, block_q)
        qb = q_ref[0, 0, :, sl].reshape(rows, D)
        dob = do_ref[0, 0, :, sl].reshape(rows, D)
        ob = o_ref[0, 0, :, sl].reshape(rows, D)
        delta = (dob.astype(jnp.float32) * ob.astype(jnp.float32)).sum(axis=-1)
        lse = lse_ref[0, 0, 0, pl.ds(j * rows, rows)]       # [G*bq]
        s = scale2 * jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s = s + kv_bias[None, :]
        if masked:
            row_slot = off + j * block_q + jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 0),
                block_q)
            s = jnp.where(kv_slot <= row_slot, s, NEG_INF)
        p = jnp.exp2(s - lse[:, None])
        pc = p.astype(kb.dtype)
        dv = dv + jax.lax.dot_general(
            pc, dob, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            dob, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None])).astype(kb.dtype)
        dk = dk + scale * jax.lax.dot_general(
            ds, qb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_upd = scale * jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dq_ref[0, 0, :, sl] = (
            dq_ref[0, 0, :, sl].astype(jnp.float32)
            + dq_upd.reshape(G, block_q, D)).astype(dq_ref.dtype)
        return dk, dv

    dk0 = jnp.zeros((bk, D), jnp.float32)
    dv0 = jnp.zeros((bk, D), jnp.float32)
    carry = (dk0, dv0)
    if causal:
        carry = jax.lax.fori_loop(first, j_clear,
                                  functools.partial(body, masked=True), carry)
        dk, dv = jax.lax.fori_loop(j_clear, nq,
                                   functools.partial(body, masked=False),
                                   carry)
    else:
        for j in range(nq):
            carry = body(j, carry, masked=False)
        dk, dv = carry
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash(q, k, v, kv_valid, q_off, causal, scale, block_q, block_k):
    out, _ = _flash_fwd_impl(q, k, v, kv_valid, q_off, causal, scale,
                             block_q, block_k)
    return out


def _flash_fwd_impl(q, k, v, kv_valid, q_off, causal, scale, block_q, block_k):
    # q: [B, HQ, T, D]; k/v: [B, HK, S, D]; kv_valid: [B, 1, S] int32
    # q_off: [1, 1] int32
    B, HQ, T, D = q.shape
    _, HK, S, _ = k.shape
    group = HQ // HK
    nq = T // block_q

    kernel = functools.partial(
        _fwd_kernel, scale2=scale * LOG2E, causal=causal,
        block_q=block_q, block_k=block_k, kv_len=S)
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, HQ, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, i: (b, h // group, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, STAT_SUBLANES, block_q),
                         lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, HQ, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, HQ, STAT_SUBLANES, T), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q_off, q, k, v, kv_valid)
    return out, lse


def _flash_fwd(q, k, v, kv_valid, q_off, causal, scale, block_q, block_k):
    out, lse = _flash_fwd_impl(q, k, v, kv_valid, q_off, causal, scale,
                               block_q, block_k)
    return out, (q, k, v, kv_valid, q_off, out, lse)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_gqa(q5, k, v, kv_valid, q_off, causal, scale, block_q, block_k):
    out, _ = _flash_gqa_fwd_impl(q5, k, v, kv_valid, q_off, causal, scale,
                                 block_q, block_k)
    return out


def _flash_gqa_fwd_impl(q5, k, v, kv_valid, q_off, causal, scale,
                        block_q, block_k):
    # q5: [B, HK, G, T, D]; k/v: [B, HK, S, D]; kv_valid: [B, 1, S] int32
    B, HK, G, T, D = q5.shape
    S = k.shape[2]
    seg = T // block_q

    kernel = functools.partial(
        _fwd_kernel_gqa, scale2=scale * LOG2E, causal=causal,
        block_q=block_q, block_k=block_k, kv_len=S, group=G)
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, HK, seg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G, block_q, D),
                         lambda b, h, i: (b, h, 0, i, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, block_q, D),
                         lambda b, h, i: (b, h, 0, i, 0)),
            pl.BlockSpec((1, 1, STAT_SUBLANES, G * block_q),
                         lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, HK, G, T, D), q5.dtype),
            jax.ShapeDtypeStruct((B, HK, STAT_SUBLANES, G * T),
                                 jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q_off, q5, k, v, kv_valid)
    return out, lse


def _flash_gqa_fwd(q5, k, v, kv_valid, q_off, causal, scale, block_q,
                   block_k):
    out, lse = _flash_gqa_fwd_impl(q5, k, v, kv_valid, q_off, causal, scale,
                                   block_q, block_k)
    return out, (q5, k, v, kv_valid, q_off, out, lse)


def _flash_gqa_bwd(causal, scale, block_q, block_k, res, dout):
    q5, k, v, kv_valid, q_off, out, lse = res
    B, HK, G, T, D = q5.shape
    S = k.shape[2]

    # q tiling is PINNED to the forward's block_q (the packed-flat lse
    # layout encodes it); kv block sized so [G*bq, bk] fp32 tiles x3 stay
    # within scoped VMEM
    bk_limit = max((24 * 1024 * 1024) // (12 * G * block_q), 128)
    # v5e scoped VMEM is 16 MiB and XLA stages the (batch-sized) k/v custom
    # -call operands there [S(1) placement]: the single-S kv block only fits
    # while score tiles + staged operands stay under the (empirical, batch 6
    # @ G=7/bq=128/S=1024 compiles at ~17.8M-estimated) ceiling; above it the
    # kv split halves the f32/bf16 score-tile stack. Override for sweeps:
    # SIMLINGO_ATTN_BWD_BLOCK_K.
    stack_est = 16 * G * block_q * S          # s/p/dp f32 + pc/ds bf16 tiles
    staged_est = 4 * B * HK * S * D           # k+v bf16 operands in VMEM
    # the 17.9e6 cut was calibrated against the default 16 MiB scoped
    # limit (see the batch-6/7 measurements below); scale it when the
    # entry point raised the limit so bigger batches / shifted staging
    # keep the fast single-block path instead of falling to the kv split
    single_block_cut = 17_900_000 * _scoped_vmem_limit_kib() // 16384
    env_bk = os.environ.get("SIMLINGO_ATTN_BWD_BLOCK_K")
    if env_bk:
        block_k = min(int(env_bk), S)
    elif (S <= 1280 and S <= bk_limit
          and stack_est + staged_est < single_block_cut):
        # single-kv-block path. Measured at G=7/bq=128/S=1024: batch 6
        # (est 17.83e6) compiles at ~15.6 MiB scoped; batch 7 (est 18.35e6)
        # allocates 16.11 MiB -- 116 KiB over the 16 MiB limit. The 17.9e6
        # cut keeps the proven-good b6 cell and pushes b7+ to the kv split.
        block_k = S
    else:
        # the staged k/v operands scale with B, so the kv block must shrink
        # as batch grows: measured b12/G=7/bq=128/S=1024 @ bk=512 allocates
        # 16.52 MiB scoped (528 KiB over) = staged 6.3 MiB + 12 B/elem score
        # tiles (s/dp f32 + p/ds bf16, 5.5 MiB) + ~5.5 MiB fixed (q/out/dout
        # bf16 + dq f32 revisited blocks + slack); 14*G*T*D matches that
        # measured fixed term. Pick the widest bk that fits.
        fixed_est = 14 * G * T * D
        split_budget = (_scoped_vmem_limit_kib() - 1024) * 1024
        block_k = 128
        for cand in (512, 256):
            scoped = staged_est + fixed_est + 12 * G * block_q * cand
            if cand <= bk_limit and scoped < split_budget:
                block_k = cand
                break
    block_k = max(128, block_k // 128 * 128)
    while S % block_k != 0:
        block_k //= 2
    nk_grid = S // block_k

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_gqa, scale=scale,
                          scale2=scale * LOG2E, causal=causal,
                          block_q=block_q, block_k=block_k, q_len=T,
                          group=G),
        grid=(B, HK, nk_grid),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, G, T, D), lambda b, h, i: (b, h, 0, 0, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, G, T, D), lambda b, h, i: (b, h, 0, 0, 0)),
            pl.BlockSpec((1, 1, G, T, D), lambda b, h, i: (b, h, 0, 0, 0)),
            pl.BlockSpec((1, 1, STAT_SUBLANES, G * T),
                         lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, G, T, D), lambda b, h, i: (b, h, 0, 0, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, HK, G, T, D),
                                 q5.dtype if nk_grid == 1 else jnp.float32),
            jax.ShapeDtypeStruct((B, HK, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, HK, S, D), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q_off, q5, k, v, kv_valid, out, dout, lse)
    return dq.astype(q5.dtype), dk, dv, None, None


_flash_gqa.defvjp(_flash_gqa_fwd, _flash_gqa_bwd)


def _flash_bwd(causal, scale, block_q, block_k, res, dout):
    q, k, v, kv_valid, q_off, out, lse = res
    B, HQ, T, D = q.shape
    _, HK, S, _ = k.shape
    group = HQ // HK

    # bwd block sizing is independent of the fwd's: a single kv block per
    # grid program (dk/dv accumulate locally over inner q blocks) measured
    # faster than a blocked kv grid at SimLingo lengths -- the revisited dq
    # buffer writes back per kv grid step otherwise
    block_k = S if S <= 1280 else 256
    block_q = T

    # The backward materializes ~three [bq, bk] fp32 tiles (p, dp, ds); pick
    # the largest inner q-block that divides T and keeps those tiles within
    # ~48 MB of scoped VMEM (v5e has 128 MB/core; leave room for the resident
    # q/do/o/dq buffers and double-buffered DMA).
    # lane-dim dynamic slices (lse) must be 128-aligned on TPU
    budget_rows = max((48 * 1024 * 1024) // (12 * block_k), 128)
    bq_inner = 128
    for d in range(128, min(block_q, budget_rows) + 1, 128):
        if T % d == 0:
            bq_inner = d
    block_q = bq_inner

    # One fused kernel: dq accumulated in a revisited block across kv steps;
    # dk/dv written per kv block (per q-head, group-reduced below).
    # Output dtypes: dk/dv can be written in the input dtype when there is no
    # cross-head group reduction (MHA, e.g. the ViT tower) -- halves the HBM
    # writes AND kills the downstream convert fusions; same for dq when a
    # single kv grid step means no cross-step accumulation. GQA (the LLM)
    # keeps f32 for exact accumulation.
    nk_grid = S // block_k
    dq_dtype = q.dtype if nk_grid == 1 else jnp.float32
    dkv_dtype = k.dtype if group == 1 else jnp.float32
    dq, dk_e, dv_e = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, scale2=scale * LOG2E,
                          causal=causal, block_q=block_q, block_k=block_k,
                          q_len=T),
        grid=(B, HQ, nk_grid),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i: (b, h // group, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i: (b, h // group, i, 0)),
            pl.BlockSpec((1, 1, S), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, STAT_SUBLANES, T), lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, T, D), lambda b, h, i: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i: (b, h, i, 0)),
            pl.BlockSpec((1, 1, block_k, D), lambda b, h, i: (b, h, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, HQ, T, D), dq_dtype),
            jax.ShapeDtypeStruct((B, HQ, S, D), dkv_dtype),
            jax.ShapeDtypeStruct((B, HQ, S, D), dkv_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q_off, q, k, v, kv_valid, out, dout, lse)

    dq = dq.astype(q.dtype)
    if group == 1:
        dk, dv = dk_e.astype(k.dtype), dv_e.astype(v.dtype)
    else:
        dk = dk_e.reshape(B, HK, group, S, D).sum(axis=2).astype(k.dtype)
        dv = dv_e.reshape(B, HK, group, S, D).sum(axis=2).astype(v.dtype)
    return dq, dk, dv, None, None


_flash.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# Lane-major HEAD-PAIR path: q/k/v/out cross HBM as [B, T, H*D] -- the exact
# layout the projection matmuls produce. Two wins over [B, H, T, D]:
#   * NO head-minor padding: a D=64 minor dim is tiled T(8,128) and pads HBM
#     2x; with heads flattened into lanes the minor dim is H*D (1024 for the
#     ViT), a 128 multiple. At batch 6 the ViT's saved q/k/v/out residuals
#     alone are ~2.6 GB -- the padding doubled them.
#   * NO relayout ops: the [B,T,HD]->[B,H,T,D] transposes (even einsum-fused)
#     wrote the padded layout; here the kernel block-slices heads' lanes
#     straight out of the matmul output.
# Pallas TPU requires block lane dims to be multiples of 128, so one grid
# program owns a PAIR of adjacent D=64 heads (a 128-lane block) and keeps
# them separate with lane masks:
#   * scores: two dots against lane-masked k -- dot(q_pair, k_pair*mask_h)
#     contracts the full 128 lanes but the masked head contributes zero.
#     A K=128 dot costs the same MXU time as the old half-depth K=64 dot,
#     so compute is unchanged; only the traffic halves.
#   * softmax/PV/backward run on ROW-STACKED [2*bq, ...] tiles (head 2's
#     rows appended below head 1's), which turns the remaining per-head
#     dots into single full-width dots (see _bwd_kernel_pair).
# MHA only (the ViT tower): the GQA-packed LLM path keeps its
# [B, HK, G, T, D] layout (its kv tensors are small and the G*bq row packing
# is worth more than the padding there).
# ---------------------------------------------------------------------------

def _lane_masks(dtype):
    """[1, 128] selectors for the low/high 64 lanes of a head pair."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    m1 = (lanes < 64).astype(dtype)
    return m1, (1 - m1.astype(jnp.float32)).astype(dtype)


def _fwd_kernel_pair(off_ref, q_ref, k_ref, v_ref, valid_ref, o_ref,
                     lse_ref, *, scale2: float, causal: bool, block_q: int,
                     block_k: int, kv_len: int):
    # q_ref/o_ref: [1, bq, 128] (two D=64 heads in lanes); k/v_ref:
    # [1, S, 128]; valid_ref: [1, 1, S]; lse_ref: [1, 2, STAT, bq]
    qi = pl.program_id(2)
    off = off_ref[0, 0]
    q = q_ref[0]                                          # [bq, 128]
    q = (q.astype(jnp.float32) * scale2).astype(q.dtype)
    bq = q.shape[0]
    rows = 2 * bq
    nk = kv_len // block_k
    m1, m2 = _lane_masks(q.dtype)

    if causal:
        # stacked row r maps to q slot off + qi*bq + (r mod bq)
        row_slot = off + qi * block_q + jax.lax.rem(
            jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 0), bq)
        last = (off + qi * block_q + bq - 1) // block_k + 1
        nk_eff = jnp.clip(last, 0, nk)
        j_full = jnp.clip((off + qi * block_q - block_k + 1) // block_k + 1,
                          0, nk_eff)
    else:
        nk_eff = nk
        j_full = nk

    def body(j, carry, masked):
        acc, m_prev, l_prev = carry
        kb = k_ref[0, pl.ds(j * block_k, block_k)]        # [bk, 128]
        vb = v_ref[0, pl.ds(j * block_k, block_k)]
        # per-head scores via lane-masked full-width dots, row-stacked
        s1 = jax.lax.dot_general(q, kb * m1, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(q, kb * m2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s = jnp.concatenate([s1, s2], axis=0)             # [2bq, bk]
        bias = jnp.where(
            valid_ref[0, 0, pl.ds(j * block_k, block_k)] != 0, 0.0, NEG_INF)
        s = s + bias[None, :]
        if masked:
            kv_slot = j * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (rows, block_k), 1)
            s = jnp.where(kv_slot <= row_slot, s, NEG_INF)
        m_cur = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp2(s - m_new[:, None])
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_prev * alpha + p.sum(axis=-1)
        # ONE full-width PV dot: row-stacked p against the unmasked v pair;
        # the off-head lanes of each row block are garbage, masked at the end
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [2bq, 128]
        return acc, m_new, l_new

    acc0 = jnp.zeros((rows, 128), jnp.float32)
    m0 = jnp.full((rows,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows,), jnp.float32)
    if not causal:
        carry = (acc0, m0, l0)
        for j in range(nk):
            carry = body(j, carry, masked=False)
    else:
        carry = jax.lax.fori_loop(0, j_full,
                                  functools.partial(body, masked=False),
                                  (acc0, m0, l0))
        carry = jax.lax.fori_loop(j_full, nk_eff,
                                  functools.partial(body, masked=True),
                                  carry)
    acc, m, l = carry

    l_safe = jnp.maximum(l, 1e-30)
    o = acc / l_safe[:, None]                             # [2bq, 128]
    m1f = m1.astype(jnp.float32)
    m2f = m2.astype(jnp.float32)
    o_ref[0] = (o[:bq] * m1f + o[bq:] * m2f).astype(o_ref.dtype)
    lse = jnp.where(l > 0, m + jnp.log2(l_safe), NEG_INF)  # [2bq]
    # stat rows via 2D ops only (1-D slices lower to unsupported gathers)
    lse2d = jnp.broadcast_to(lse[None, :], (STAT_SUBLANES, 2 * bq))
    lse_ref[0, 0] = jax.lax.slice(lse2d, (0, 0), (STAT_SUBLANES, bq))
    lse_ref[0, 1] = jax.lax.slice(lse2d, (0, bq), (STAT_SUBLANES, 2 * bq))


def _bwd_kernel_pair(off_ref, q_ref, k_ref, v_ref, valid_ref, o_ref, do_ref,
                     lse_ref, dq_ref, dk_ref, dv_ref, *, scale: float,
                     scale2: float, causal: bool, block_q: int,
                     block_k: int, q_len: int):
    """Head-pair fused backward (see _bwd_kernel for the algorithm and
    _fwd_kernel_pair for the pair/lane-mask scheme). All cross-row dots run
    row-STACKED at full 128-lane width:
      dv = p_stackT @ (do stacked lane-masked)       [bk, 128]
      dp = (do stacked lane-masked) @ vbT            [2bq, bk]
      dk = ds_stackT @ (q stacked lane-masked)       [bk, 128]
      dq = lane-select(ds_stack @ kb)                [bq, 128]
    """
    ki = pl.program_id(2)
    off = off_ref[0, 0]
    kb = k_ref[0]                                         # [bk, 128]
    vb = v_ref[0]
    bk = kb.shape[0]
    nq = q_len // block_q
    m1, m2 = _lane_masks(kb.dtype)
    m1f = m1.astype(jnp.float32)
    m2f = m2.astype(jnp.float32)

    @pl.when(ki == 0)
    def _():
        dq_ref[0] = jnp.zeros_like(dq_ref[0])

    kv_bias = jnp.where(valid_ref[0, 0, pl.ds(ki * block_k, bk)] != 0,
                        0.0, NEG_INF)
    if causal:
        kv_slot = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, (2 * block_q, bk), 1)
        first = jnp.clip((ki * block_k - off) // block_q, 0, nq)
        j_clear = jnp.clip(-((off - ki * block_k - block_k + 1) // block_q),
                           first, nq)
    else:
        first = 0
        j_clear = 0

    def body(j, carry, masked):
        dk, dv = carry
        sl = pl.ds(j * block_q, block_q)
        qb = q_ref[0, sl]                                 # [bq, 128]
        dob = do_ref[0, sl]
        ob = o_ref[0, sl]
        dof = dob.astype(jnp.float32) * ob.astype(jnp.float32)
        # per-head row stats kept as separate [bq] vectors; all stacking
        # happens on 2D tiles (1-D concats/slices lower to gathers)
        delta_lo = (dof * m1f).sum(axis=-1)               # [bq]
        delta_hi = (dof * m2f).sum(axis=-1)
        lse_lo = lse_ref[0, 0, 0, sl]                     # [bq]
        lse_hi = lse_ref[0, 1, 0, sl]
        s1 = jax.lax.dot_general(qb, kb * m1, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(qb, kb * m2, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s = scale2 * jnp.concatenate([s1, s2], axis=0)    # [2bq, bk]
        s = s + kv_bias[None, :]
        if masked:
            row_slot = off + j * block_q + jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (2 * block_q, bk), 0),
                block_q)
            s = jnp.where(kv_slot <= row_slot, s, NEG_INF)
        p = jnp.concatenate(
            [jnp.exp2(s[:block_q] - lse_lo[:, None]),
             jnp.exp2(s[block_q:] - lse_hi[:, None])], axis=0)  # [2bq, bk]
        pc = p.astype(kb.dtype)
        do_stack = jnp.concatenate([dob * m1, dob * m2], axis=0)  # [2bq, 128]
        dv = dv + jax.lax.dot_general(
            pc, do_stack, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [bk, 128]
        dp = jax.lax.dot_general(
            do_stack, vb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [2bq, bk]
        ds = (p * jnp.concatenate(
            [dp[:block_q] - delta_lo[:, None],
             dp[block_q:] - delta_hi[:, None]], axis=0)).astype(kb.dtype)
        q_stack = jnp.concatenate([qb * m1, qb * m2], axis=0)
        dk = dk + scale * jax.lax.dot_general(
            ds, q_stack, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [bk, 128]
        dq_full = jax.lax.dot_general(
            ds, kb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [2bq, 128]
        dq_upd = scale * (dq_full[:block_q] * m1f
                          + dq_full[block_q:] * m2f)      # [bq, 128]
        dq_ref[0, sl] = (dq_ref[0, sl].astype(jnp.float32)
                         + dq_upd).astype(dq_ref.dtype)
        return dk, dv

    dk0 = jnp.zeros((bk, 128), jnp.float32)
    dv0 = jnp.zeros((bk, 128), jnp.float32)
    carry = (dk0, dv0)
    if causal:
        carry = jax.lax.fori_loop(first, j_clear,
                                  functools.partial(body, masked=True), carry)
        dk, dv = jax.lax.fori_loop(j_clear, nq,
                                   functools.partial(body, masked=False),
                                   carry)
    else:
        for j in range(nq):
            carry = body(j, carry, masked=False)
        dk, dv = carry
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash_lm(q, k, v, kv_valid, q_off, num_heads, causal, scale, block_q,
              block_k):
    out, _ = _flash_lm_fwd_impl(q, k, v, kv_valid, q_off, num_heads, causal,
                                scale, block_q, block_k)
    return out


def _flash_lm_fwd_impl(q, k, v, kv_valid, q_off, num_heads, causal, scale,
                       block_q, block_k):
    # q: [B, T, H*D]; k/v: [B, S, H*D]; kv_valid: [B, 1, S] int32
    B, T, HD = q.shape
    S = k.shape[1]
    H = num_heads
    nq = T // block_q
    npair = H // 2

    kernel = functools.partial(
        _fwd_kernel_pair, scale2=scale * LOG2E, causal=causal,
        block_q=block_q, block_k=block_k, kv_len=S)
    out, lse = pl.pallas_call(
        kernel,
        grid=(B, npair, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_q, 128), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, S, 128), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((1, S, 128), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((1, 1, S), lambda b, h, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, 128), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, 2, STAT_SUBLANES, block_q),
                         lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, HD), q.dtype),
            jax.ShapeDtypeStruct((B, H, STAT_SUBLANES, T), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q_off, q, k, v, kv_valid)
    return out, lse


def _flash_lm_fwd(q, k, v, kv_valid, q_off, num_heads, causal, scale,
                  block_q, block_k):
    out, lse = _flash_lm_fwd_impl(q, k, v, kv_valid, q_off, num_heads,
                                  causal, scale, block_q, block_k)
    return out, (q, k, v, kv_valid, q_off, out, lse)


def _flash_lm_bwd(num_heads, causal, scale, block_q, block_k, res, dout):
    q, k, v, kv_valid, q_off, out, lse = res
    B, T, HD = q.shape
    S = k.shape[1]
    H = num_heads
    npair = H // 2

    # inner-block sizing: the pair kernel's score tiles are ROW-STACKED
    # ([2*bq, bk]), and v5e scoped VMEM is 16 MiB -- budget ~12 MiB across
    # the ~3 fp32 [2bq, bk] tiles (s/p, dp) + bf16 (pc, ds) + stacks.
    # Sweep overrides (scripts/attn_bwd_sweep.py): SIMLINGO_ATTN_LM_BWD_
    # BLOCK_K / _BLOCK_Q pin the kv block / inner q block directly.
    env_bk = os.environ.get("SIMLINGO_ATTN_LM_BWD_BLOCK_K")
    if env_bk:
        block_k = min(int(env_bk), S)
        while S % block_k != 0:
            block_k //= 2
        block_k = max(block_k, 128)
    else:
        block_k = S if S <= 1280 else 256
    budget_rows = max((12 * 1024 * 1024) // (24 * block_k), 128)
    bq_inner = 128
    for d in range(128, min(T, budget_rows) + 1, 128):
        if T % d == 0:
            bq_inner = d
    env_bq = os.environ.get("SIMLINGO_ATTN_LM_BWD_BLOCK_Q")
    if env_bq and T % int(env_bq) == 0:
        bq_inner = int(env_bq)
    nk_grid = S // block_k
    dq_dtype = q.dtype if nk_grid == 1 else jnp.float32

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_pair, scale=scale,
                          scale2=scale * LOG2E, causal=causal,
                          block_q=bq_inner, block_k=block_k, q_len=T),
        grid=(B, npair, nk_grid),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, T, 128), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((1, block_k, 128), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, block_k, 128), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, 1, S), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, T, 128), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((1, T, 128), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((1, 2, STAT_SUBLANES, T),
                         lambda b, h, i: (b, h, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, 128), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((1, block_k, 128), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, block_k, 128), lambda b, h, i: (b, i, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, HD), dq_dtype),
            jax.ShapeDtypeStruct((B, S, HD), k.dtype),
            jax.ShapeDtypeStruct((B, S, HD), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=_interpret(),
    )(q_off, q, k, v, kv_valid, out, dout, lse)
    return dq.astype(q.dtype), dk, dv, None, None


_flash_lm.defvjp(_flash_lm_fwd, _flash_lm_bwd)


def flash_attention(
    q: jnp.ndarray,                     # [B, T, HQ, D] (or [B, HQ, T, D])
    k: jnp.ndarray,                     # [B, S, HK, D] (or [B, HK, S, D])
    v: jnp.ndarray,                     # [B, S, HK, D] (or [B, HK, S, D])
    kv_valid: Optional[jnp.ndarray] = None,   # [B, S] bool
    causal: bool = True,
    scale: Optional[float] = None,
    block_q: Optional[int] = None,
    block_k: Optional[int] = None,
    q_offset: Optional[jnp.ndarray] = None,   # scalar: global slot of q row 0
    layout: str = "bthd",
    num_heads: Optional[int] = None,          # bt_hd: q heads
    num_kv_heads: Optional[int] = None,       # bt_hd: kv heads (default = q)
) -> jnp.ndarray:
    """Pallas flash attention with slot-order causality + key-validity masking.

    Block sizing: at SimLingo sequence lengths (<= ~1.3k) a SINGLE block per
    (batch, head) minimizes grid-program count and DMA overhead (the scores
    tile fits VMEM comfortably); longer sequences fall back to 256-blocks.

    layout="bhtd" takes/returns head-major tensors and skips the wrapper's
    relayouts entirely -- callers that can produce q/k/v head-major via an
    einsum (the ViT tower) save four [B, H, T, D]-sized copies per layer.

    layout="bt_hd" (MHA only) takes/returns FLAT head tensors [B, T, H*D] --
    the projection matmuls' native output -- and never materializes a
    [B, H, T, D] array at all: no relayout ops AND no 2x HBM padding of the
    64-lane head dim (see _flash_lm head-pair scheme; requires `num_heads`,
    an even head count, and D == 64).
    """
    assert layout in ("bthd", "bhtd", "bt_hd"), layout
    if layout == "bt_hd":
        assert num_heads, "bt_hd layout requires num_heads"
        B, T, HDq = q.shape
        _, S, HDk = k.shape
        HQ = num_heads
        HK = num_kv_heads or HQ
        D = HDq // HQ
        assert HQ == HK, "bt_hd is the MHA path (GQA keeps the packed path)"
        assert HQ % 2 == 0 and D == 64, \
            "bt_hd packs two 64-wide heads per 128-lane block"
    elif layout == "bhtd":
        B, HQ, T, D = q.shape
        _, HK, S, _ = k.shape
    else:
        B, T, HQ, D = q.shape
        _, S, HK, _ = k.shape
    if scale is None:
        scale = D ** -0.5
    if q_offset is None:
        q_offset = S - T
    q_off = jnp.full((1, 1), q_offset, jnp.int32)

    def ceil128(n):
        return -(-n // 128) * 128

    if causal and T > 256 and os.environ.get("SIMLINGO_ATTN_BLOCKED", "1") == "1":
        # blocked grid exploits causal pruning: interior blocks skip the
        # slot-compare entirely and blocks above the diagonal never run.
        # Narrow q blocks x wide k blocks measured fastest on-chip (the
        # q-block dim is the grid axis -- more parallel programs -- while a
        # wide k block keeps the inner MXU contraction long): bq=128/bk=512
        # is ~2x bq=bk=256 at SimLingo lengths (scripts/attn_sweep.py).
        if block_k is None:
            block_k = 512
        if block_q is None:
            block_q = 128
    if block_k is None:
        # NOTE round-2 finding: a half-S kv split measures ~1.4x faster in a
        # STANDALONE microbench (unrolled blocks overlap MXU/VPU) but is a
        # consistent ~2% full-step REGRESSION in-context -- standalone kernel
        # timings on this chip do not transfer; trust the step bench.
        block_k = ceil128(S) if ceil128(S) <= 1280 else 256
    if block_q is None:
        block_q = ceil128(T) if ceil128(T) <= 1280 else 256
    block_q = min(block_q, ceil128(T))
    block_k = min(block_k, ceil128(S))

    if kv_valid is None:
        kv_valid = jnp.ones((B, S), dtype=jnp.int32)
    else:
        # broadcast explicitly: the kernel's index map addresses the batch
        # dim directly, so a [1, S] mask would be read out of bounds for
        # b > 0 (silent OOB DMA -- crashes some TPU runtimes)
        kv_valid = jnp.broadcast_to(kv_valid, (B, S)).astype(jnp.int32)

    if layout == "bt_hd":
        # lane-major: pad only the sequence (row) dim; heads stay in lanes
        qt = _pad_to(q, 1, block_q)
        kt = _pad_to(k, 1, block_k)
        vt = _pad_to(v, 1, block_k)
        valid = _pad_to(kv_valid, 1, block_k)[:, None, :]
        Tp = qt.shape[1]
        out = _flash_lm(qt, kt, vt, valid, q_off, HQ, causal, scale,
                        block_q, block_k)
        return out[:, :T]

    # [B, T, H, D] -> [B, H, T, D]; pad sequence dims to block multiples
    if layout == "bhtd":
        qt, kt, vt = q, k, v
    else:
        qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    qt = _pad_to(qt, 2, block_q)
    kt = _pad_to(kt, 2, block_k)
    vt = _pad_to(vt, 2, block_k)
    valid = _pad_to(kv_valid, 1, block_k)[:, None, :]   # [B, 1, S]

    group = HQ // HK
    if group > 1 and os.environ.get("SIMLINGO_ATTN_GQA", "1") == "1":
        # GQA-packed path: free reshape to [B, HK, group, T, D] (heads are
        # kv-major), one grid program per kv head per q block
        Tp = qt.shape[2]
        q5 = qt.reshape(B, HK, group, Tp, D)
        out = _flash_gqa(q5, kt, vt, valid, q_off, causal, scale,
                         block_q, block_k)
        out = out.reshape(B, HQ, Tp, D)
    else:
        out = _flash(qt, kt, vt, valid, q_off, causal, scale, block_q,
                     block_k)
    out = out[:, :, :T]
    return out if layout == "bhtd" else out.transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _hybrid(q, k, v, kv_valid, causal, scale, q_offset_static):
    return flash_attention(q, k, v, kv_valid, causal=causal, scale=scale,
                           q_offset=q_offset_static)


def _hybrid_fwd(q, k, v, kv_valid, causal, scale, q_offset_static):
    out = flash_attention(q, k, v, kv_valid, causal=causal, scale=scale,
                          q_offset=q_offset_static)
    return out, (q, k, v, kv_valid)


def _hybrid_bwd(causal, scale, q_offset_static, res, g):
    q, k, v, kv_valid = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: attention_reference(
            q_, k_, v_, kv_valid, causal=causal, scale=scale,
            q_offset=q_offset_static), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_hybrid.defvjp(_hybrid_fwd, _hybrid_bwd)


def flash_attention_hybrid(q, k, v, kv_valid=None, causal=True, scale=None,
                           q_offset=None):
    """Pallas forward + XLA-recompute backward.

    Robust training path for TPU runtimes where our fused Pallas backward
    misbehaves: the forward stays fused/flash (no T^2 materialization at
    inference or in the saved residuals); the backward recomputes attention
    with plain XLA einsums (fine at SimLingo sequence lengths ~1k).
    Requires a static q_offset (training always has q_offset None => S-T).
    """
    assert q_offset is None or isinstance(q_offset, int)
    return _hybrid(q, k, v, kv_valid, causal, scale, q_offset)


# Global implementation override: "auto" | "pallas" | "hybrid" | "xla" | "bundled".
# "bundled" adapts jax's reference TPU flash kernel (GQA expanded, validity
# via segment ids) -- an escape hatch for TPU runtimes where our fused
# backward misbehaves; it only covers the training case (T == S, no offset).
_ATTN_IMPL = os.environ.get("SIMLINGO_ATTN_IMPL", "auto")


def set_attention_impl(impl: str) -> None:
    global _ATTN_IMPL
    assert impl in ("auto", "pallas", "hybrid", "xla", "bundled"), impl
    _ATTN_IMPL = impl


def get_attention_impl() -> str:
    return _ATTN_IMPL


def _attention_bundled(q, k, v, kv_valid, causal, scale, q_offset):
    """Adapter over jax's bundled TPU flash kernel (fwd+bwd).

    Covers the full training case: causal or not, GQA (kv heads expanded),
    arbitrary lengths (padded to 128 with pad-segment masking; pad q rows
    share the pad segment so their softmax stays finite and their dk/dv
    contribution is exactly zero under zero cotangents).
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds)
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jax_fa)
    B, T, HQ, D = q.shape
    _, S, HK, _ = k.shape
    assert T == S, "bundled impl covers the training case (T == S)"
    group = HQ // HK
    Tp = -(-T // 128) * 128
    qt = _pad_to(q.transpose(0, 2, 1, 3), 2, 128)
    kt = _pad_to(jnp.repeat(k.transpose(0, 2, 1, 3), group, axis=1), 2, 128)
    vt = _pad_to(jnp.repeat(v.transpose(0, 2, 1, 3), group, axis=1), 2, 128)
    if kv_valid is None:
        seg = jnp.ones((B, T), jnp.int32)
    else:
        seg = kv_valid.astype(jnp.int32)
    seg = _pad_to(seg, 1, 128)          # pads get segment 0
    segs = SegmentIds(q=seg, kv=seg)
    # largest multiple of 128 that divides the padded length, capped at 512
    blk = max(m for m in range(128, min(512, Tp) + 1, 128) if Tp % m == 0)
    block_sizes = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk,
        block_k_dkv=blk, block_q_dkv=blk,
        block_k_major_dq=blk, block_k_dq=blk, block_q_dq=blk,
    )
    out = jax_fa(qt, kt, vt, segment_ids=segs, causal=causal,
                 sm_scale=scale if scale is not None else D ** -0.5,
                 block_sizes=block_sizes)
    return out[:, :, :T].transpose(0, 2, 1, 3).astype(q.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kv_valid: Optional[jnp.ndarray] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    q_offset: Optional[jnp.ndarray] = None,
    layout: str = "bthd",
    num_heads: Optional[int] = None,
    num_kv_heads: Optional[int] = None,
) -> jnp.ndarray:
    """Dispatch between our Pallas kernel, the XLA reference, and the
    bundled-kernel adapter (see _ATTN_IMPL)."""
    # Sequence parallelism (parallel/sequence.py): when the trainer enabled
    # an sp mesh axis, cache-free self-attention whose sequence divides the
    # axis runs as ring attention with the sequence dim sharded. Everything
    # else (KV-cached decode/prefill via q_offset, the 1025-token ViT,
    # single-token calls) falls through to the single-chip kernels.
    # Escape hatches still work: an explicit use_pallas=False (tests forcing
    # the XLA reference) or SIMLINGO_SP_ATTN=0 bypasses the ring, computing
    # attention on the replicated sequence instead -- correct, just not
    # sequence-sharded.
    if layout == "bthd" and q.ndim == 4 and q_offset is None \
            and q.shape[1] == k.shape[1] and use_pallas is not False \
            and os.environ.get("SIMLINGO_SP_ATTN", "1") != "0":
        from simlingo_tpu.parallel import sequence as _sp
        _st = _sp.active_axis()
        if _st is not None and q.shape[1] % _st[2] == 0:
            return _sp.ring_attention(q, k, v, kv_valid, causal=causal,
                                      scale=scale, mesh=_st[0], axis=_st[1])
    impl = _ATTN_IMPL
    if use_pallas is False:
        impl = "xla"
    elif use_pallas is True:
        impl = "pallas"
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "bundled" and q.shape[1] != k.shape[1]:
        # decode / query-forward (T != S): fwd-only, our Pallas kernel works
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "hybrid" and not (q_offset is None or isinstance(q_offset, int)):
        impl = "pallas"  # dynamic offset => inference path, fwd-only
    if impl == "pallas":
        return flash_attention(q, k, v, kv_valid, causal=causal, scale=scale,
                               q_offset=q_offset, layout=layout,
                               num_heads=num_heads,
                               num_kv_heads=num_kv_heads)
    # remaining impls are bthd-native: relayout at the boundary
    if layout == "bhtd":
        q, k, v = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    elif layout == "bt_hd":
        B, T, _ = q.shape
        S = k.shape[1]
        HK = num_kv_heads or num_heads
        q = q.reshape(B, T, num_heads, -1)
        k = k.reshape(B, S, HK, -1)
        v = v.reshape(B, S, HK, -1)
    if impl == "hybrid":
        out = flash_attention_hybrid(q, k, v, kv_valid, causal=causal,
                                     scale=scale, q_offset=q_offset)
    elif impl == "bundled":
        out = _attention_bundled(q, k, v, kv_valid, causal, scale, q_offset)
    else:
        out = attention_reference(q, k, v, kv_valid, causal=causal,
                                  scale=scale, q_offset=q_offset)
    if layout == "bhtd":
        return out.transpose(0, 2, 1, 3)
    if layout == "bt_hd":
        return out.reshape(out.shape[0], out.shape[1], -1)
    return out
