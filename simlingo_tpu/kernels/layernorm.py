"""Pallas TPU fused LayerNorm / RMSNorm (forward + backward).

The XLA norms in models/layers.py cast the whole activation to fp32 for
the stats; when XLA does not fuse the cast -> stats -> normalize -> cast
chain into its neighbors, the fp32 temporary round-trips HBM (the round-2
trace attributed ~40 ms/step to f32 convert/reduce fusions,
docs/BENCH_NOTES.md). These kernels keep the fp32 life entirely
in-register: load bf16, accumulate stats in fp32, write bf16 -- one read
+ one write of the activation in each pass, which is the bandwidth floor.

Backward (custom VJP): dx is computed from the saved per-row (mean, rstd)
with the standard reduction identities; the parameter gradients are
accumulated across the sequential TPU grid into a single (1, d) output
block with a constant index map (the block stays VMEM-resident across
grid steps) -- no cross-program atomics needed.

Selection: models/layers.py routes through these when
SIMLINGO_LN_IMPL=pallas (default stays XLA until the chip-measured win is
recorded in docs/BENCH_NOTES.md). Off-TPU, kernels run in interpret mode
(CPU tests).

Reference counterpart: torch.nn.LayerNorm / Qwen2RMSNorm inside HF
modeling code (apex-fused in the reference's production stack).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_rows(n_rows: int, d: int, want: int = 256) -> int:
    # Row blocks are multiples of 128 (rows beyond n are padded) so the
    # [rows, 1] stat arrays stay (8, 128)-tile aligned. Working set per
    # row is ~16*D bytes fp32 across x/y/dy/dx; stay well under the
    # ~16 MB scoped VMEM.
    del n_rows
    cap = max(128, ((8 * 1024 * 1024) // (16 * d)) // 128 * 128)
    return min(want, cap)


# ---------------------------------------------------------------------------
# forward kernels
# ---------------------------------------------------------------------------

def _ln_fwd_kernel(x_ref, scale_ref, bias_ref, o_ref, mean_ref, rstd_ref,
                   *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    mean = x.mean(axis=-1, keepdims=True)
    xc = x - mean
    var = (xc * xc).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = xc * rstd * scale_ref[...].astype(jnp.float32) \
        + bias_ref[...].astype(jnp.float32)
    o_ref[...] = y.astype(o_ref.dtype)
    # stats are rank-2 [rows, 1]: rank-1 f32 arrays get XLA's T(1024) 1-D
    # tiling, which mismatches Mosaic's block-derived T(block) layout; the
    # [rows, 1] form uses the ordinary (8, 128) 2-D tiling on both sides
    mean_ref[...] = mean
    rstd_ref[...] = rstd


def _rms_fwd_kernel(x_ref, scale_ref, o_ref, rstd_ref, *, eps: float):
    x = x_ref[...].astype(jnp.float32)
    var = (x * x).mean(axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    o_ref[...] = (x * rstd
                  * scale_ref[...].astype(jnp.float32)).astype(o_ref.dtype)
    rstd_ref[...] = rstd


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _ln_bwd_kernel(x_ref, scale_ref, mean_ref, rstd_ref, dy_ref,
                   dx_ref, dscale_ref, dbias_ref):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    mean = mean_ref[...]                     # [rows, 1]
    rstd = rstd_ref[...]
    xhat = (x - mean) * rstd
    dxhat = dy * scale_ref[...].astype(jnp.float32)
    m1 = dxhat.mean(axis=-1, keepdims=True)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)
    # Parameter grads: the TPU grid is sequential, so accumulate partials
    # into a single (1, d) output block with a constant index map -- the
    # block stays resident in VMEM across grid steps and is written back
    # once.  (A per-step [grid, 1, d] partials output does NOT lower:
    # Mosaic squeezes the unit middle dim and then rejects the resulting
    # (1, d) block of a [grid, d] array -- row dim neither 8-aligned nor
    # equal to the array dim.)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
        dbias_ref[...] = jnp.zeros_like(dbias_ref)
    dscale_ref[...] += (dy * xhat).sum(axis=0)[None, :]
    dbias_ref[...] += dy.sum(axis=0)[None, :]


def _rms_bwd_kernel(x_ref, scale_ref, rstd_ref, dy_ref,
                    dx_ref, dscale_ref):
    x = x_ref[...].astype(jnp.float32)
    dy = dy_ref[...].astype(jnp.float32)
    rstd = rstd_ref[...]                     # [rows, 1]
    xhat = x * rstd
    dxhat = dy * scale_ref[...].astype(jnp.float32)
    m2 = (dxhat * xhat).mean(axis=-1, keepdims=True)
    dx_ref[...] = (rstd * (dxhat - xhat * m2)).astype(dx_ref.dtype)
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dscale_ref[...] = jnp.zeros_like(dscale_ref)
    dscale_ref[...] += (dy * xhat).sum(axis=0)[None, :]


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def _pad_rows(x2: jnp.ndarray, block: int) -> Tuple[jnp.ndarray, int]:
    n = x2.shape[0]
    n_pad = -(-n // block) * block
    if n_pad != n:
        x2 = jnp.pad(x2, ((0, n_pad - n), (0, 0)))
    return x2, n_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layernorm_fused(x, scale, bias, eps: float = 1e-6):
    y, _, _ = _ln_fwd(x, scale, bias, eps)
    return y


def _ln_fwd(x, scale, bias, eps):
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    block = _block_rows(n, d)
    x2, n_pad = _pad_rows(x2, block)
    grid = n_pad // block
    y, mean, rstd = pl.pallas_call(
        functools.partial(_ln_fwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[pl.BlockSpec((block, d), lambda i: (i, 0)),
                  pl.BlockSpec((1, d), lambda i: (0, 0)),
                  pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((block, d), lambda i: (i, 0)),
                   pl.BlockSpec((block, 1), lambda i: (i, 0)),
                   pl.BlockSpec((block, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((n_pad, d), x.dtype),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)],
        interpret=_interpret(),
    )(x2, scale.reshape(1, d), bias.reshape(1, d))
    return y[:n].reshape(orig_shape), mean[:n], rstd[:n]


def _ln_vjp_fwd(x, scale, bias, eps):
    y, mean, rstd = _ln_fwd(x, scale, bias, eps)
    return y, (x, scale, mean, rstd)


def _ln_vjp_bwd(eps, res, dy):
    x, scale, mean, rstd = res
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    dy2 = dy.reshape(-1, d)
    n = x2.shape[0]
    block = _block_rows(n, d)
    x2, n_pad = _pad_rows(x2, block)
    dy2, _ = _pad_rows(dy2, block)
    mean_p = jnp.pad(mean, ((0, n_pad - n), (0, 0)))
    rstd_p = jnp.pad(rstd, ((0, n_pad - n), (0, 0)))
    grid = n_pad // block
    dx, dscale_p, dbias_p = pl.pallas_call(
        _ln_bwd_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((block, d), lambda i: (i, 0)),
                  pl.BlockSpec((1, d), lambda i: (0, 0)),
                  pl.BlockSpec((block, 1), lambda i: (i, 0)),
                  pl.BlockSpec((block, 1), lambda i: (i, 0)),
                  pl.BlockSpec((block, d), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((block, d), lambda i: (i, 0)),
                   pl.BlockSpec((1, d), lambda i: (0, 0)),
                   pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n_pad, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), jnp.float32),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        interpret=_interpret(),
    )(x2, scale.reshape(1, d), mean_p, rstd_p, dy2)
    dx = dx[:n].reshape(orig_shape)
    dscale = dscale_p[0].astype(scale.dtype)
    dbias = dbias_p[0].astype(scale.dtype)
    return dx, dscale, dbias


layernorm_fused.defvjp(_ln_vjp_fwd, _ln_vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def rmsnorm_fused(x, scale, eps: float = 1e-6):
    y, _ = _rms_fwd(x, scale, eps)
    return y


def _rms_fwd(x, scale, eps):
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    n = x2.shape[0]
    block = _block_rows(n, d)
    x2, n_pad = _pad_rows(x2, block)
    grid = n_pad // block
    y, rstd = pl.pallas_call(
        functools.partial(_rms_fwd_kernel, eps=eps),
        grid=(grid,),
        in_specs=[pl.BlockSpec((block, d), lambda i: (i, 0)),
                  pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_specs=[pl.BlockSpec((block, d), lambda i: (i, 0)),
                   pl.BlockSpec((block, 1), lambda i: (i, 0))],
        out_shape=[jax.ShapeDtypeStruct((n_pad, d), x.dtype),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)],
        interpret=_interpret(),
    )(x2, scale.reshape(1, d))
    return y[:n].reshape(orig_shape), rstd[:n]


def _rms_vjp_fwd(x, scale, eps):
    y, rstd = _rms_fwd(x, scale, eps)
    return y, (x, scale, rstd)


def _rms_vjp_bwd(eps, res, dy):
    x, scale, rstd = res
    orig_shape = x.shape
    d = orig_shape[-1]
    x2 = x.reshape(-1, d)
    dy2 = dy.reshape(-1, d)
    n = x2.shape[0]
    block = _block_rows(n, d)
    x2, n_pad = _pad_rows(x2, block)
    dy2, _ = _pad_rows(dy2, block)
    rstd_p = jnp.pad(rstd, ((0, n_pad - n), (0, 0)))
    grid = n_pad // block
    dx, dscale_p = pl.pallas_call(
        _rms_bwd_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((block, d), lambda i: (i, 0)),
                  pl.BlockSpec((1, d), lambda i: (0, 0)),
                  pl.BlockSpec((block, 1), lambda i: (i, 0)),
                  pl.BlockSpec((block, d), lambda i: (i, 0))],
        out_specs=[pl.BlockSpec((block, d), lambda i: (i, 0)),
                   pl.BlockSpec((1, d), lambda i: (0, 0))],
        out_shape=[jax.ShapeDtypeStruct((n_pad, d), x.dtype),
                   jax.ShapeDtypeStruct((1, d), jnp.float32)],
        interpret=_interpret(),
    )(x2, scale.reshape(1, d), rstd_p, dy2)
    dx = dx[:n].reshape(orig_shape)
    dscale = dscale_p[0].astype(scale.dtype)
    return dx, dscale


rmsnorm_fused.defvjp(_rms_vjp_fwd, _rms_vjp_bwd)
