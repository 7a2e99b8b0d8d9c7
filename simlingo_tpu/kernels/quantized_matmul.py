"""Pallas TPU w8a16 (int8-weight, bf16-activation) matmul for decode.

Why a kernel and not `x @ w_q.astype(bf16) * scale`: single-token decode of
the 0.5B LLM is HBM-bandwidth-bound on the *weight* reads (SURVEY.md §6 —
the reference's latency path re-forwards the prefix per token; ours is
KV-cached, so weight bytes are the floor). XLA hoists the loop-invariant
int8->bf16 convert out of the decode `while_loop`, materializing a bf16 copy
in HBM and erasing the bandwidth win; a custom call cannot be hoisted, so the
weights cross HBM at int8 width every step: ~2x decode speedup.

Quantization scheme: symmetric per-output-channel int8
    w_q[i, o] = round(w[i, o] / scale[o]),  scale[o] = max_i |w[i, o]| / 127

`transpose_rhs=True` supports the tied-embedding LM head (w stored
[vocab, hidden], per-vocab-row scales) without a second transposed copy.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def quantize_weight(w: jnp.ndarray, axis: int = 1
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """w [in, out] -> (w_q int8 [in, out], scale f32 [out]) (axis=1: per-out).

    axis=0 quantizes per-row (used for [vocab, hidden] embedding tables).
    """
    w = np.asarray(w, np.float32) if not isinstance(w, jnp.ndarray) else w
    red_axis = 1 - axis
    amax = jnp.max(jnp.abs(w), axis=red_axis)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    sc = scale[None, :] if axis == 1 else scale[:, None]
    w_q = jnp.clip(jnp.round(w / sc), -127, 127).astype(jnp.int8)
    return w_q, scale.astype(jnp.float32)


def _kernel(x_ref, w_ref, s_ref, o_ref, *, transpose_rhs: bool):
    x = x_ref[...]                                    # [M, K]
    w = w_ref[...].astype(x.dtype)                    # [K, bn] or [bn, K]
    dims = (((1,), (1,)), ((), ())) if transpose_rhs else (((1,), (0,)), ((), ()))
    acc = jax.lax.dot_general(x, w, dims,
                              preferred_element_type=jnp.float32)  # [M, bn]
    o_ref[...] = (acc * s_ref[...][None, :]).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def int8_matmul(x: jnp.ndarray,            # [..., K] bf16/f32
                w_q: jnp.ndarray,          # [K, N] int8 (or [N, K] if transpose_rhs)
                scale: jnp.ndarray,        # [N] f32
                transpose_rhs: bool = False,
                block_n: int = 1024,
                out_dtype=None) -> jnp.ndarray:
    """y[..., n] = sum_k x[..., k] * w_q[k, n] * scale[n].

    Differentiable in the ACTIVATION only (dx = (g * scale) @ W^T through the
    same int8-width weight reads); w_q/scale are frozen serving/base weights
    and get zero cotangents -- this is what lets the w8a16 base LLM sit in
    the *training* forward (LoRA training differentiates through the frozen
    base for dx but never updates it).
    """
    return _int8_matmul_impl(x, w_q, scale, transpose_rhs, block_n, out_dtype)


def _int8_matmul_fwd(x, w_q, scale, transpose_rhs, block_n, out_dtype):
    y = _int8_matmul_impl(x, w_q, scale, transpose_rhs, block_n, out_dtype)
    return y, (w_q, scale)


def _int8_matmul_bwd(transpose_rhs, block_n, out_dtype, res, g):
    w_q, scale = res
    K = w_q.shape[1] if transpose_rhs else w_q.shape[0]
    # dx[.., k] = sum_n g[.., n] * scale[n] * w_q[k, n]: the scaled cotangent
    # through the transposed int8 weight -- same kernel, ones-scale output
    gs = (g.astype(jnp.float32) * scale).astype(g.dtype)
    ones_k = jnp.ones((K,), jnp.float32)
    # barrier the int8 weights so the bwd's int8->bf16 convert is a DIFFERENT
    # expression from the fwd's: without it XLA CSEs the two converts into
    # one bf16 copy that stays live from forward to backward -- every frozen
    # layer's weights held at bf16 width across the whole step (~1 GB extra,
    # OOMs batch 6). With the barrier each convert has a single consumer dot
    # and fuses into its operand load: weights cross HBM at int8 width twice.
    dx = _int8_matmul_impl(gs, jax.lax.optimization_barrier(w_q), ones_k,
                           not transpose_rhs, block_n, g.dtype)
    dw = np.zeros(w_q.shape, jax.dtypes.float0)      # int8 primal: float0
    dscale = jnp.zeros_like(scale)
    return dx, dw, dscale


int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


# ---------------------------------------------------------------------------
# w4a16: int4 weights with GROUP-wise scales (serving path)
# ---------------------------------------------------------------------------
#
# Decode is HBM-bound on weight reads (module docstring); int4 halves the
# bytes again vs w8a16. Per-output-channel scales are too coarse at 4 bits,
# so weights are quantized per (group of `group` reduction rows, output
# channel) -- the GPTQ/AWQ storage layout, computed here as plain round-to-
# nearest. The matmul never expands scales into the [K, N] domain: the dot
# runs per group (batched dot_general over G) and the [G, M, N] partial sums
# are scaled then reduced, so nothing K x N-shaped is materialized at
# decode M.
#
# Storage is NIBBLE-PACKED int8 (two int4 codes per byte, packed along the
# reduction axis), NOT jnp.int4: sub-byte S4 arrays cannot currently be
# relayouted at dispatch on the TPU runtime (device_put recurses between the
# array's T(8,128)(8,1) layout and the executable's T(64,128)(8,1) -- a
# RecursionError the moment a jitted function takes an S4 argument). Packed
# int8 has none of that, the unpack (two shifts) fuses into the dot's
# operand load, and the bytes crossing HBM are identical.

INT4_GROUP = 128


def pack_int4(w_int: jnp.ndarray, axis: int) -> jnp.ndarray:
    """int4 codes (any int dtype, values in [-8, 7]) -> packed int8.

    Adjacent pairs along `axis` share a byte: even index -> low nibble,
    odd index -> high nibble. Output has half the extent along `axis`.
    """
    w = jnp.asarray(w_int, jnp.int8)
    axis = axis % w.ndim
    assert w.shape[axis] % 2 == 0, "pack axis extent must be even"
    lo = jax.lax.slice_in_dim(w, 0, w.shape[axis], 2, axis)
    hi = jax.lax.slice_in_dim(w, 1, w.shape[axis], 2, axis)
    return ((hi << 4) | (lo & 0xF)).astype(jnp.int8)


def unpack_int4(p: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Packed int8 -> int8 tensor of int4 values, interleaved along `axis`
    (inverse of pack_int4). The two arithmetic shifts are elementwise on the
    packed bytes, so XLA fuses the unpack into the consumer's operand load."""
    axis = axis % p.ndim
    lo = ((p << 4) >> 4).astype(jnp.int8)   # arithmetic: sign-extends
    hi = (p >> 4).astype(jnp.int8)
    st = jnp.stack([lo, hi], axis=axis + 1)
    shape = p.shape[:axis] + (p.shape[axis] * 2,) + p.shape[axis + 1:]
    return st.reshape(shape)


def quantize_weight4(w: jnp.ndarray, axis: int = 1, group: int = INT4_GROUP
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """axis=1: w [K, N] -> (w_q packed int8 [K//2, N], scale f32 [K//group, N]).
    axis=0: w [V, H] -> (w_q packed int8 [V, H//2], scale f32 [V, H//group])
    (per-vocab-row groups; serves the gather and the tied LM head).

    Symmetric round-to-nearest onto [-7, 7] (the -8 code is unused to keep
    the scale symmetric); codes are nibble-packed along the reduction axis
    (see pack_int4).
    """
    red = w.shape[0] if axis == 1 else w.shape[1]
    assert red % group == 0, f"reduction dim {red} % group {group} != 0"
    assert group % 2 == 0
    G = red // group
    if axis == 1:
        K, N = w.shape
        wg = w.astype(jnp.float32).reshape(G, group, N)
        amax = jnp.abs(wg).max(axis=1)                      # [G, N]
        scale = jnp.maximum(amax, 1e-8) / 7.0
        w_q = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
        return pack_int4(w_q.reshape(K, N), axis=0), scale
    V, H = w.shape
    wg = w.astype(jnp.float32).reshape(V, G, group)
    amax = jnp.abs(wg).max(axis=2)                          # [V, G]
    scale = jnp.maximum(amax, 1e-8) / 7.0
    w_q = jnp.clip(jnp.round(wg / scale[:, :, None]), -7, 7)
    return pack_int4(w_q.reshape(V, H), axis=1), scale


def dequantize_weight4(w_q: jnp.ndarray, scale: jnp.ndarray,
                       transpose_rhs: bool = False, dtype=jnp.bfloat16
                       ) -> jnp.ndarray:
    """Expand (packed w_q, group scales) back to a dense weight
    (non-decode paths)."""
    if transpose_rhs:                         # packed [V, H//2], scale [V, G]
        w8 = unpack_int4(w_q, axis=1)
        V, H = w8.shape
        G = scale.shape[1]
        wb = w8.astype(jnp.float32).reshape(V, G, H // G) * scale[:, :, None]
        return wb.reshape(V, H).astype(dtype)
    w8 = unpack_int4(w_q, axis=0)             # packed [K//2, N], scale [G, N]
    K, N = w8.shape
    G = scale.shape[0]
    wb = w8.astype(jnp.float32).reshape(G, K // G, N) * scale[:, None, :]
    return wb.reshape(K, N).astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def int4_matmul(x: jnp.ndarray,           # [..., K]
                w_q: jnp.ndarray,         # packed int8 [K//2, N] ([V, K//2] if transpose)
                scale: jnp.ndarray,       # [G, N] f32  ([V, G] if transpose)
                transpose_rhs: bool = False) -> jnp.ndarray:
    """y = x @ dequant(w_q, scale) with int4-width weight reads at decode M.

    Like int8_matmul, differentiable in the activation only (frozen serving
    weights)."""
    return _int4_matmul_impl(x, w_q, scale, transpose_rhs)


def _int4_matmul_impl(x, w_q, scale, transpose_rhs=False) -> jnp.ndarray:
    orig_shape = x.shape
    K = orig_shape[-1]
    M = int(np.prod(orig_shape[:-1])) if len(orig_shape) > 1 else 1
    x2 = x.reshape(M, K)
    N = w_q.shape[0] if transpose_rhs else w_q.shape[1]
    G = scale.shape[1] if transpose_rhs else scale.shape[0]
    k = K // G

    if M > 64:
        # non-decode sizes (serving prefill edge cases): one dense dot over a
        # dequantized copy; no barrier, the convert fuses into the operand
        wb = dequantize_weight4(w_q, scale, transpose_rhs, x.dtype)
        y = x2 @ (wb.T if transpose_rhs else wb)
        return y.astype(x.dtype).reshape(orig_shape[:-1] + (N,))

    # decode: per-group batched dot; barrier keeps the unpack+convert inside
    # the decode while_loop (same reasoning as the int8 path above); the
    # nibble unpack is elementwise on the packed bytes and fuses into the
    # dot's operand load, so weights cross HBM at int4 width
    xg = x2.reshape(M, G, k).transpose(1, 0, 2)             # [G, M, k]
    wb = unpack_int4(jax.lax.optimization_barrier(w_q),
                     axis=1 if transpose_rhs else 0).astype(x.dtype)
    if transpose_rhs:
        wg = wb.reshape(N, G, k).transpose(1, 0, 2)         # [G, N, k]
        yg = jax.lax.dot_general(xg, wg, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        y = (yg * scale.T[:, None, :]).sum(0)               # [M, N]
    else:
        wg = wb.reshape(G, k, N)
        yg = jax.lax.dot_general(xg, wg, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        y = (yg * scale[:, None, :]).sum(0)
    return y.astype(x.dtype).reshape(orig_shape[:-1] + (N,))


def _int4_matmul_fwd(x, w_q, scale, transpose_rhs):
    return _int4_matmul_impl(x, w_q, scale, transpose_rhs), (w_q, scale)


def _int4_matmul_bwd(transpose_rhs, res, g):
    w_q, scale = res
    # dx[m, k in group g] = sum_n g[m, n] * scale[g-of-k, n] * w[k, n]: the
    # group axis rides the OUTPUT dim of the transposed product, so the
    # forward impl cannot be reused -- fold scale[g] into a per-group
    # cotangent and run one batched dot over G.
    orig = g.shape
    N = orig[-1]
    M = int(np.prod(orig[:-1])) if len(orig) > 1 else 1
    g2 = g.reshape(M, N).astype(jnp.float32)
    if transpose_rhs:
        # fwd: y = x @ dequant(w_q packed [V, H//2], scale [V, G]).T; dx [M, H]
        V, H = w_q.shape[0], w_q.shape[1] * 2
        G = scale.shape[1]
        if M > 64:
            dx = g2 @ dequantize_weight4(w_q, scale, True, jnp.float32)
        else:
            gs = g2[None] * scale.T[:, None, :]                 # [G, M, V]
            wv = unpack_int4(jax.lax.optimization_barrier(w_q),
                             axis=1).astype(jnp.float32)
            wv = wv.reshape(V, G, H // G).transpose(1, 0, 2)    # [G, V, k]
            dxg = jax.lax.dot_general(gs, wv, (((2,), (1,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
            dx = dxg.transpose(1, 0, 2).reshape(M, H)
        out_k = H
    else:
        # fwd: y = x @ dequant(w_q packed [K//2, N], scale [G, N]); dx [M, K]
        K = w_q.shape[0] * 2
        G = scale.shape[0]
        if M > 64:
            dx = g2 @ dequantize_weight4(w_q, scale, False, jnp.float32).T
        else:
            gs = g2[None] * scale[:, None, :]                   # [G, M, N]
            wk = unpack_int4(jax.lax.optimization_barrier(w_q),
                             axis=0).astype(jnp.float32)
            wk = wk.reshape(G, K // G, N)                       # [G, k, N]
            dxg = jax.lax.dot_general(gs, wk, (((2,), (2,)), ((0,), (0,))),
                                      preferred_element_type=jnp.float32)
            dx = dxg.transpose(1, 0, 2).reshape(M, K)
        out_k = K
    dx = dx.astype(g.dtype).reshape(orig[:-1] + (out_k,))
    dw = np.zeros(w_q.shape, jax.dtypes.float0)
    dscale = jnp.zeros_like(scale)
    return dx, dw, dscale


int4_matmul.defvjp(_int4_matmul_fwd, _int4_matmul_bwd)


def _int8_matmul_impl(x, w_q, scale, transpose_rhs=False, block_n=1024,
                      out_dtype=None) -> jnp.ndarray:
    orig_shape = x.shape
    K = orig_shape[-1]
    N = w_q.shape[0] if transpose_rhs else w_q.shape[1]
    M = int(np.prod(orig_shape[:-1])) if len(orig_shape) > 1 else 1
    x2 = x.reshape(M, K)
    out_dtype = out_dtype or x.dtype

    if M <= 64 or M > 2048 or M * K * x2.dtype.itemsize > 8 * 2 ** 20:
        # Decode-sized M (<= 64): a plain XLA dot with the int8->bf16 convert
        # behind an optimization barrier beats the pallas kernel (fewer
        # custom-call dispatches; the barrier stops XLA hoisting the convert
        # out of the decode while_loop, so weights still cross HBM at int8
        # width -- measured ~0.2 ms/token faster than the kernel at 24
        # layers). Training-sized M (> 2048 rows or > 8 MiB activations):
        # the decode kernel holds the full [M, K] + [M, block_n] tiles in
        # VMEM, which does not fit; the XLA dot is the right program -- and
        # WITHOUT the barrier, so the convert fuses into the dot operand
        # instead of materializing a bf16 weight copy per layer (with the
        # barrier the training step carries ~1 GB of converted copies).
        wb = (jax.lax.optimization_barrier(w_q) if M <= 64 else w_q
              ).astype(x.dtype)
        dims = ((((1,), (1,)) if transpose_rhs else ((1,), (0,))), ((), ()))
        acc = jax.lax.dot_general(x2, wb, dims,
                                  preferred_element_type=jnp.float32)
        out = (acc * scale[None, :]).astype(out_dtype)
        return out.reshape(orig_shape[:-1] + (N,))

    # pad M to sublane multiple; N to block multiple
    Mp = -(-M // 8) * 8
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    block_n = min(block_n, -(-N // 128) * 128)
    Np = -(-N // block_n) * block_n
    if Np != N:
        pad_w = ((0, Np - N), (0, 0)) if transpose_rhs else ((0, 0), (0, Np - N))
        w_q = jnp.pad(w_q, pad_w)
        scale = jnp.pad(scale, (0, Np - N))

    w_spec = (pl.BlockSpec((block_n, K), lambda i: (i, 0)) if transpose_rhs
              else pl.BlockSpec((K, block_n), lambda i: (0, i)))
    out = pl.pallas_call(
        functools.partial(_kernel, transpose_rhs=transpose_rhs),
        grid=(Np // block_n,),
        in_specs=[
            pl.BlockSpec((Mp, K), lambda i: (0, 0)),
            w_spec,
            pl.BlockSpec((block_n,), lambda i: (i,)),
        ],
        out_specs=pl.BlockSpec((Mp, block_n), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(x2, w_q, scale)
    return out[:M, :N].reshape(orig_shape[:-1] + (N,))
