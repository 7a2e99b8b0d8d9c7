"""Device mesh + sharding rules: the framework's entire "distributed backend".

The reference reaches NCCL through Lightning DDP / DeepSpeed ZeRO-2
(SURVEY.md section 2.9): gradients reduce-scattered, optimizer state sharded,
params replicated, fp16 loss scale. On TPU all of that becomes *declarative*:

  * mesh axes ("dp", "fsdp", "tp"):
      - dp: pure data parallel (gradients psum'd by XLA over ICI),
      - fsdp: parameter + optimizer-state sharding (ZeRO-3 superset of the
        reference's ZeRO-2; XLA inserts all-gather/reduce-scatter),
      - tp: tensor parallel over attention heads / MLP hidden dim -- not
        needed at 1B params (SURVEY.md 2.9) but a config change, not a rewrite;
  * batch is sharded over (dp, fsdp);
  * bf16 compute removes the reference's loss-scaling machinery entirely.

Multi-host: call jax.distributed.initialize() before make_mesh(); the same
rules produce DCN-aware layouts because jax's mesh construction orders
devices host-major.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, fsdp: int = 1, tp: int = 1, sp: int = 1,
              pp: int = 1, devices=None) -> Mesh:
    """dp x fsdp x tp mesh, plus optional sp (sequence) and pp (pipeline) axes.

    sp shards ACTIVATIONS along the sequence dim (parallel/sequence.py ring
    attention); parameters never mention it, so the partition rules below
    are sp-agnostic. sp neighbors sit adjacent in device order so the ring's
    ppermute rides single ICI hops.

    pp shards the LLM decoder LAYER dim (parallel/pipeline.py collective
    pipelining over stacked layer params); innermost for the same
    adjacent-ICI-hop reason -- the pipeline's stage-to-stage ppermute is a
    neighbor transfer.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        dp = n // (fsdp * tp * sp * pp)
    assert dp * fsdp * tp * sp * pp == n, \
        f"{dp}x{fsdp}x{tp}x{sp}x{pp} != {n} devices"
    dev = np.asarray(devices).reshape(dp, fsdp, tp, sp, pp)
    return Mesh(dev, ("dp", "fsdp", "tp", "sp", "pp"))


# (regex over tree path, PartitionSpec) -- first match wins.
# Paths look like "llm/layers/0/attn/q/w".
PARTITION_RULES: Sequence[Tuple[str, P]] = (
    # Stacked-layer (pipeline-parallel) LLM layout: leaves carry a leading
    # layer dim sharded over pp (parallel/pipeline.py). Paths have NO layer
    # index ("llm/layers/attn/q/w"), so these exact patterns never match the
    # legacy dict layout ("llm/layers/0/attn/q/w") below.
    (r"llm/layers/attn/(q|k|v)/w$",  P("pp", "fsdp", "tp")),
    (r"llm/layers/attn/(q|k|v)/b$",  P("pp", "tp")),
    (r"llm/layers/attn/o/w$",        P("pp", "tp", "fsdp")),
    (r"llm/layers/mlp/(gate|up)/w$", P("pp", "fsdp", "tp")),
    (r"llm/layers/mlp/down/w$",      P("pp", "tp", "fsdp")),
    (r"llm/layers/ln[12]/",          P("pp")),
    (r"lora/layers/[a-z]+/a$",       P("pp", "fsdp", None)),
    (r"lora/layers/[a-z]+/b$",       P("pp", None, "fsdp")),
    # LLM
    (r"llm/embed/w$",              P("tp", "fsdp")),
    (r"llm/lm_head/w$",            P("fsdp", "tp")),
    (r"llm/.*attn/(q|k|v)/w$",     P("fsdp", "tp")),
    (r"llm/.*attn/(q|k|v)/b$",     P("tp")),
    (r"llm/.*attn/o/w$",           P("tp", "fsdp")),
    (r"llm/.*mlp/(gate|up)/w$",    P("fsdp", "tp")),
    (r"llm/.*mlp/down/w$",         P("tp", "fsdp")),
    # LoRA: keep the low-rank dim replicated, shard the wide dim
    (r"lora/.*/(a)$",              P("fsdp", None)),
    (r"lora/.*/(b)$",              P(None, "fsdp")),
    # Vision tower
    (r"vision/.*attn/(q|k|v)/w$",  P("fsdp", "tp")),
    (r"vision/.*attn/o/w$",        P("tp", "fsdp")),
    (r"vision/.*mlp/fc1/w$",       P("fsdp", "tp")),
    (r"vision/.*mlp/fc2/w$",       P("tp", "fsdp")),
    (r"vision/patch_embed/w$",     P(None, "fsdp")),
    (r"vision/pos_embed$",         P(None, None, "fsdp")),
    (r"vision/projector/fc1/w$",   P("fsdp", "tp")),
    (r"vision/projector/fc2/w$",   P("tp", "fsdp")),
    # Adaptors / everything else: replicated
    (r".*",                        P()),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def spec_for_path(path_str: str, rules=PARTITION_RULES) -> P:
    for pattern, spec in rules:
        if re.search(pattern, path_str):
            return spec
    return P()


def _shardable(spec: P, shape, mesh: Mesh) -> P:
    """Drop spec entries that don't divide the dimension evenly."""
    out = []
    for dim, names in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if names is None:
            out.append(None)
            continue
        names_t = (names,) if isinstance(names, str) else tuple(names)
        size = int(np.prod([mesh.shape[n] for n in names_t]))
        out.append(names if dim % size == 0 else None)
    return P(*out)


def param_shardings(params: Any, mesh: Mesh,
                    rules=PARTITION_RULES) -> Any:
    """Pytree of NamedShardings matching `params`."""
    def f(path, x):
        spec = spec_for_path(_path_str(path), rules)
        spec = _shardable(spec, x.shape, mesh)
        return NamedSharding(mesh, spec)
    return jax.tree_util.tree_map_with_path(f, params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over dp x fsdp."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def batch_shardings(batch: Any, mesh: Mesh) -> Any:
    bs = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    def f(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            dp = mesh.shape["dp"] * mesh.shape["fsdp"]
            return bs if x.shape[0] % dp == 0 else rep
        return rep
    return jax.tree_util.tree_map(f, batch)


def put_batch(batch: Any, mesh: Mesh) -> Any:
    """Device-place a host-local batch under the mesh's batch shardings.

    Single-process: plain device_put (the array is the global batch).
    Multi-process: each host holds only its LOCAL slice of the global batch
    (the trainer hands each process a disjoint sampler slice);
    jax.make_array_from_process_local_data assembles the global array from
    the per-host shards without any cross-host transfer. Replicated leaves
    (static metadata, 0-d scalars) must be identical on every host.
    """
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(jax.device_put, batch,
                                      batch_shardings(batch, mesh))
    bs = batch_sharding(mesh)
    rep = NamedSharding(mesh, P())
    dp = mesh.shape["dp"] * mesh.shape["fsdp"]
    pc = jax.process_count()

    def f(x):
        x = np.asarray(x)
        # global leading dim = local * process_count; shard it when the full
        # dp extent divides it (same rule as batch_shardings, global view)
        s = bs if x.ndim >= 1 and (x.shape[0] * pc) % dp == 0 else rep
        return jax.make_array_from_process_local_data(s, x)

    return jax.tree_util.tree_map(f, batch)


def shard_params(params: Any, mesh: Mesh, rules=PARTITION_RULES) -> Any:
    shardings = param_shardings(params, mesh, rules)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
