"""Pallas TPU dropout via the hardware PRNG.

Replaces `jax.random.bernoulli`-based dropout on the training hot path
(LoRA input dropout, reference peft LoraConfig lora_dropout=0.1 --
simlingo_training/models/language_model/llm.py:111-117). Threefry masks cost
~78 ms/step at SimLingo shapes (bit generation is a long VPU program, and XLA
rematerializes the draws for the backward); the on-core hardware PRNG
generates bits at near-register speed, so this kernel is pure-bandwidth:
read x, write x*mask.

The backward never stores the mask: `pltpu.prng_seed` is deterministic, so
the VJP re-seeds with the same value and applies the identical mask to the
cotangent. Mask memory: zero. Determinism: per (seed, shape) -- reproducible
across fwd/bwd and across runs, same contract as the threefry path (the
stream itself differs, which dropout semantics do not care about).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(seed_ref, x_ref, o_ref, *, threshold: int, inv_keep: float,
            grid_dims: tuple):
    # independent stream per grid block: fold every grid index into ONE
    # flat block id (Mosaic's tpu.prng_set_seed_32 takes at most two
    # values, so a per-dim spread fails to compile on real hardware)
    flat = jnp.int32(0)
    for d, n in enumerate(grid_dims):
        flat = flat * jnp.int32(n) + pl.program_id(d)
    pltpu.prng_seed(seed_ref[0], flat)
    bits = pltpu.bitcast(pltpu.prng_random_bits(x_ref.shape), jnp.uint32)
    keep = bits >= jnp.uint32(threshold)
    o_ref[...] = jnp.where(
        keep, x_ref[...] * jnp.asarray(inv_keep, x_ref.dtype),
        jnp.zeros((), x_ref.dtype))


def _apply(x, seed, rate: float, block_rows: int = 512):
    if _interpret():
        # the TPU PRNG primitive has no CPU lowering; use a threefry mask
        # keyed by the same seed (identical fwd/bwd masks, same contract)
        key = jax.random.PRNGKey(seed[0].astype(jnp.uint32))
        keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
        return jnp.where(keep, x * jnp.asarray(1.0 / (1.0 - rate), x.dtype),
                         jnp.zeros((), x.dtype))
    # keep iff bits >= threshold: P(drop) = threshold / 2^32
    threshold = min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1)
    from simlingo_tpu.core import gates
    if gates.dropout_v2():
        # Native-rank path: operate on the array as-is with a cdiv grid
        # (Mosaic pads boundary reads and masks boundary writes). The
        # flatten-to-2D form below forces XLA to relayout
        # [B, T, C] -> [B*T, C] around every call (rank-3 tiling pads each
        # batch element's rows to 8, rank-2 packs them), which the round-4
        # trace measured at ~25 ms/step of pure reshape/pad/slice across
        # the ~170 dropout sites (docs/BENCH_NOTES.md).
        orig_shape = x.shape
        if x.ndim < 2:
            x = x.reshape(1, -1)
        C = x.shape[-1]
        T = x.shape[-2]
        lead = x.shape[:-2]
        # 16 MB scoped-VMEM stack: block holds x (2B), out (2B) and the
        # uint32 random bits (4B) per element
        block_rows = min(block_rows, -(-T // 8) * 8,
                         max(8, ((6 * 1024 * 1024) // (8 * C)) // 8 * 8))
        grid = tuple(lead) + (pl.cdiv(T, block_rows),)
        blk = (1,) * len(lead) + (block_rows, C)

        def index_map(*ids):
            return (*ids[:-1], ids[-1], 0)

        out = pl.pallas_call(
            functools.partial(_kernel, threshold=threshold,
                              inv_keep=1.0 / (1.0 - rate), grid_dims=grid),
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(blk, index_map),
            ],
            out_specs=pl.BlockSpec(blk, index_map),
            out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            interpret=_interpret(),
        )(seed, x)
        return out.reshape(orig_shape)

    # legacy flatten-to-2D path (SIMLINGO_DROPOUT_V2=0 escape hatch)
    orig_shape = x.shape
    C = orig_shape[-1]
    N = 1
    for d in orig_shape[:-1]:
        N *= d
    x2 = x.reshape(N, C)
    block_rows = min(block_rows,
                     max(8, ((6 * 1024 * 1024) // (8 * C)) // 8 * 8))
    Np = -(-N // block_rows) * block_rows
    if Np != N:
        x2 = jnp.pad(x2, ((0, Np - N), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, threshold=threshold,
                          inv_keep=1.0 / (1.0 - rate),
                          grid_dims=(Np // block_rows,)),
        grid=(Np // block_rows,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((block_rows, C), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((block_rows, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, C), x.dtype),
        interpret=_interpret(),
    )(seed, x2)
    return out[:N].reshape(orig_shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def hw_dropout(x: jnp.ndarray, seed: jnp.ndarray, rate: float) -> jnp.ndarray:
    """x * Bernoulli(1-rate) / (1-rate); seed: int32[1] scalar-prefetch array.

    CPU/interpret note: pallas interpret mode emulates the TPU PRNG, so the
    fwd/bwd masks still match off-TPU.
    """
    return _apply(x, seed, rate)


def _fwd(x, seed, rate):
    return _apply(x, seed, rate), seed


def _bwd(rate, seed, g):
    # identical seed => identical mask; scaling is linear so the VJP of
    # x*mask/keep is g*mask/keep
    return _apply(g, seed, rate), None


hw_dropout.defvjp(_fwd, _bwd)


def make_seed(key: jax.Array) -> jnp.ndarray:
    """Derive an int32[1] kernel seed from a jax PRNG key (mixes both key
    words -- threefry keys store small seeds as [0, seed])."""
    data = jax.random.key_data(key) if hasattr(jax.random, "key_data") \
        else key
    flat = data.reshape(-1)
    mixed = flat[0] ^ flat[-1] if flat.shape[0] > 1 else flat[0]
    return mixed.reshape(1).astype(jnp.int32)
