"""Pipeline parallelism: collective pipelining over a ``pp`` mesh axis.

The reference never pipelines (1B params fit one GPU; SURVEY.md section
2.9), but a framework intended for production deployment should not cap
its model depth at one chip's HBM either. This module adds the missing
axis the TPU-native way:

  * the LLM decoder's per-layer params are restacked so every leaf carries
    a leading LAYER dim (``stack_layer_tree``), sharded over ``pp`` by the
    partition rules in ``parallel/mesh.py`` -- each device holds only its
    contiguous block of layers at rest (true pipeline memory scaling, not
    a per-step gather);
  * the forward enters a PARTIAL-MANUAL ``jax.shard_map`` (manual over
    ``pp`` only, exactly like ``parallel/sequence.py``): dp/fsdp/tp
    shardings of the same tensors stay declarative, so a pp stage's local
    matmuls still run tensor-parallel under pjit;
  * the batch splits into M microbatches that stream through the stages
    (GPipe schedule): tick t has stage s computing microbatch t-s; between
    ticks activations hop to the next stage via a single non-wrapping
    ``ppermute`` (one ICI hop -- pp is the innermost mesh axis). M + S - 1
    ticks total; the (S-1)/M bubble fraction is the standard GPipe cost;
  * the backward is jax AD through the tick scan: ``ppermute`` transposes
    to the reverse hop, so the cotangents stream back through the stages
    in reverse pipeline order -- the 1F1B-style backward emerges from the
    transpose rather than being hand-scheduled. ``remat=True`` wraps each
    stage in ``jax.checkpoint`` so a stage stashes only its boundary
    activations per tick (GPipe's activation recomputation).

Dropout note: microbatch decomposition changes the logical shapes the
hardware-PRNG dropout kernel sees, so a pipelined step's masks (and
therefore its loss) differ from the unpipelined step's at the same rng --
statistically identical, bitwise different. The microbatch index is folded
into the per-layer seed so masks stay independent across microbatches.
Parity tests pin exactness with dropout off (tests/test_pipeline_parallel.py).

Decode (KV-cache) paths never route here: per-token latency would pay the
pipeline bubble every step. ``qwen2.forward`` only consults this module
for cache-free training/scoring forwards.
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

# Module-level context, set by the trainer (or the `pipeline_parallel`
# context manager in tests) BEFORE tracing: tracing bakes the routing in,
# same idiom as parallel/sequence.py.
_STATE = {"mesh": None, "axis": None, "microbatches": 0, "remat": True,
          "trace_count": 0}


def enable(mesh: Mesh, axis: str = "pp", microbatches: int = 0,
           remat: bool = True) -> None:
    """Route eligible decoder forwards through the pipeline over `axis`.

    No-op (disable) when the mesh lacks the axis or it has size 1.
    microbatches=0 means "one per pipeline stage" (the minimum that keeps
    every stage busy once per tick).
    """
    if axis in mesh.shape and mesh.shape[axis] > 1:
        _STATE.update(mesh=mesh, axis=axis, microbatches=microbatches,
                      remat=remat, trace_count=0)
    else:
        disable()


def disable() -> None:
    _STATE["mesh"] = _STATE["axis"] = None


def active_axis() -> Optional[Tuple[Mesh, str, int]]:
    """(mesh, axis, n_stages) when pipeline parallelism is enabled."""
    mesh, axis = _STATE["mesh"], _STATE["axis"]
    if mesh is None:
        return None
    return mesh, axis, mesh.shape[axis]


def trace_count() -> int:
    """How many decoder forwards routed through the pipeline since
    enable() (lets callers assert pp actually engaged)."""
    return _STATE["trace_count"]


@contextlib.contextmanager
def pipeline_parallel(mesh: Mesh, axis: str = "pp", microbatches: int = 0,
                      remat: bool = True):
    prev = dict(_STATE)
    enable(mesh, axis, microbatches, remat)
    try:
        yield
    finally:
        _STATE.update(prev)


# ---------------------------------------------------------------------------
# Stacked layer layout
# ---------------------------------------------------------------------------

def is_stacked(layers: Any) -> bool:
    """True for the stacked layout ({'ln1': ..., 'attn': ...} with leading
    layer dims), False for the legacy dict-of-layers ({'0': ..., '1': ...})."""
    return isinstance(layers, dict) and "0" not in layers


def stack_layer_tree(layers: dict) -> Any:
    """{'0': tree, '1': tree, ...} -> one tree whose leaves are stacked
    along a new leading layer dim. All layers must share a treedef."""
    n = len(layers)
    seq = [layers[str(i)] for i in range(n)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *seq)


def unstack_layer_tree(stacked: Any) -> dict:
    """Inverse of stack_layer_tree (e.g. for exporting checkpoints back to
    the dict layout the HF converter emits)."""
    leaves = jax.tree_util.tree_leaves(stacked)
    n = leaves[0].shape[0]
    return {str(i): jax.tree_util.tree_map(lambda x: x[i], stacked)
            for i in range(n)}


def layer_at(stacked: Any, i) -> Any:
    """Per-layer slice of a stacked tree (static or traced index)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
        stacked)


# ---------------------------------------------------------------------------
# The pipeline (runs INSIDE shard_map: layer leaves are per-stage slices)
# ---------------------------------------------------------------------------

def _num_microbatches(batch: int, n_stages: int) -> int:
    m = _STATE["microbatches"] or n_stages
    if batch % m:
        # fall back to the largest divisor of batch that is <= requested;
        # a ragged final microbatch would need dynamic shapes
        m = next(d for d in range(min(m, batch), 0, -1) if batch % d == 0)
    return m


def pipeline_layers(
    stacked_layers: Any,              # leaves [L, ...], dim 0 sharded on pp
    stacked_lora: Optional[Any],      # leaves [L, ...] or None
    x: jnp.ndarray,                   # [B, T, H] (global shapes)
    batched_aux: Tuple[Any, ...],     # trees w/ leading batch dim (cos, ...)
    layer_fn: Callable[..., jnp.ndarray],
    # layer_fn(lp, lo, x_mb, aux_mb..., global_layer_idx, mb_idx) -> x_mb
    mesh: Optional[Mesh] = None,
    axis: Optional[str] = None,
) -> jnp.ndarray:
    """Run L stacked decoder layers as an S-stage GPipe pipeline over `axis`.

    Returns the [B, T, H] output (identical math to running the L layers
    sequentially; see module docstring for the dropout caveat).
    """
    if mesh is None or axis is None:
        st = active_axis()
        assert st is not None, "pipeline_layers: no pp context; pass mesh+axis"
        mesh, axis, _ = st
    S = mesh.shape[axis]
    L = jax.tree_util.tree_leaves(stacked_layers)[0].shape[0]
    assert L % S == 0, f"layers {L} must divide pp={S}"
    Lps = L // S
    B, T, H = x.shape
    M = _num_microbatches(B, S)
    mb = B // M
    remat = _STATE["remat"]
    _STATE["trace_count"] += 1

    def split_mb(a):
        return (a.reshape((M, mb) + a.shape[1:])
                if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == B
                else a)

    x_mbs = x.reshape(M, mb, T, H)
    aux_mbs = jax.tree_util.tree_map(split_mb, batched_aux)

    def body(stk, lstk, x_mbs, aux_mbs):
        s = jax.lax.axis_index(axis)

        def stage(x_in, mb_idx):
            aux = jax.tree_util.tree_map(
                lambda a: (jax.lax.dynamic_index_in_dim(a, mb_idx, 0,
                                                        keepdims=False)
                           if hasattr(a, "ndim") and a.ndim >= 1
                           and a.shape[0] == M else a),
                aux_mbs)

            if lstk is None:
                def one_layer(x_c, inp):
                    lp, j = inp
                    return layer_fn(lp, None, x_c, aux, s * Lps + j,
                                    mb_idx), None
                out, _ = jax.lax.scan(one_layer, x_in,
                                      (stk, jnp.arange(Lps)))
            else:
                def one_layer(x_c, inp):
                    lp, lo, j = inp
                    return layer_fn(lp, lo, x_c, aux, s * Lps + j,
                                    mb_idx), None
                out, _ = jax.lax.scan(one_layer, x_in,
                                      (stk, lstk, jnp.arange(Lps)))
            return out

        if remat:
            stage = jax.checkpoint(stage)

        def vary(v):
            return jax.lax.pcast(v, (axis,), to="varying")

        perm = [(j, j + 1) for j in range(S - 1)]  # non-wrapping hop

        def tick(carry, t):
            cur, outs = carry
            mb_idx = jnp.clip(t - s, 0, M - 1)
            inp = jnp.where(s == 0,
                            jax.lax.dynamic_index_in_dim(x_mbs, mb_idx, 0,
                                                         keepdims=False),
                            cur)
            y = stage(inp, mb_idx)
            oidx = t - (S - 1)
            write = (s == S - 1) & (oidx >= 0)
            oidx_c = jnp.clip(oidx, 0, M - 1)
            old = jax.lax.dynamic_index_in_dim(outs, oidx_c, 0,
                                               keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, old), oidx_c, 0)
            cur = jax.lax.ppermute(y, axis, perm)
            return (cur, outs), None

        cur0 = vary(jnp.zeros((mb, T, H), x_mbs.dtype))
        outs0 = vary(jnp.zeros((M, mb, T, H), x_mbs.dtype))
        (_, outs), _ = jax.lax.scan(tick, (cur0, outs0),
                                    jnp.arange(M + S - 1))
        # only stage S-1 wrote real outputs; psum broadcasts them (every
        # other stage contributes zeros)
        return jax.lax.psum(outs, axis)

    def leaf_spec(tree):
        return jax.tree_util.tree_map(lambda _: P(axis), tree)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(leaf_spec(stacked_layers),
                  None if stacked_lora is None else leaf_spec(stacked_lora),
                  P(), jax.tree_util.tree_map(lambda _: P(), aux_mbs)),
        out_specs=P(),
        axis_names={axis},
    )
    out = fn(stacked_layers, stacked_lora, x_mbs, aux_mbs)
    return out.reshape(B, T, H)
