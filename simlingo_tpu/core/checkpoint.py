"""Checkpointing: orbax save/restore for sharded train state + HF import.

Counterpart of the reference's checkpoint story (SURVEY.md section 5.4):
Lightning ModelCheckpoint writing DeepSpeed ZeRO directories + fp32
consolidation, resume via trainer.fit(ckpt_path=...), inference loading a
consolidated pytorch_model.pt.

TPU redesign:
  * orbax writes the (possibly sharded) param/optimizer pytrees directly --
    no consolidation step needed; restore re-shards to the current mesh;
  * `load_hf_checkpoint` imports the published torch checkpoints
    (RenzKa/simlingo's pytorch_model.pt or an InternVL2-1B HF directory,
    incl. peft-LoRA merge) into our parameter tree;
  * the data pipeline needs no state: the sampler is a pure function of
    (seed, step), so `step` alone resumes data order (data/sampler.py).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


_ASYNC_CKPTR = None


def _async_ckptr():
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        import orbax.checkpoint as ocp
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_checkpoints() -> None:
    """Block until any in-flight async save is durable on disk."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(ckpt_dir: str, state: Dict[str, Any], step: int,
                    keep: Optional[int] = None, block: bool = True) -> str:
    """block=False overlaps the disk write with training: orbax's async
    checkpointer copies device->host synchronously inside save() (so the
    train step may donate the state buffers immediately after) and writes
    in a background thread; at most one save is in flight. GC runs only
    when nothing is in flight (a partially-written tmp dir must never be
    listed as prunable)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(ckpt_dir, f"step_{step:08d}"))
    if os.path.isdir(path):      # idempotent: periodic + final save collide
        return path
    if block:
        wait_for_checkpoints()   # serialize with any pending async save
        if os.path.isdir(path):
            return path
        # One retry: orbax's ocdbt finalize validation can flake under IO
        # pressure ("N params are missing .zarray", observed 2026-08-20 on
        # a scalar opt_state.count leaf) and the failed attempt leaves a
        # poisoned step_X.orbax-checkpoint-tmp dir that would also break
        # the next attempt's tmp-dir creation.
        for attempt in range(2):
            ckptr = ocp.StandardCheckpointer()
            try:
                ckptr.save(path, state)
                ckptr.wait_until_finished()
                break
            except Exception:
                if attempt:
                    raise
                _clean_tmp_dirs(ckpt_dir, step)
        if keep is not None:
            _gc_checkpoints(ckpt_dir, keep)
        return path
    c = _async_ckptr()
    c.wait_until_finished()      # previous save is durable now
    if keep is not None:
        _gc_checkpoints(ckpt_dir, keep)
    c.save(path, state)
    return path


def _clean_tmp_dirs(ckpt_dir: str, step: int) -> None:
    """Remove a failed attempt's orbax tmp dirs for `step` (the writer has
    already errored out and been joined, so nothing is still writing)."""
    import shutil
    prefix = f"step_{step:08d}"
    if not os.path.isdir(ckpt_dir):
        return
    for d in os.listdir(ckpt_dir):
        if d.startswith(prefix) and "tmp" in d:
            shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


def _finished_steps(ckpt_dir: str):
    # exclude orbax in-flight/orphaned tmp dirs (step_X.orbax-...-tmp-...)
    if not os.path.isdir(ckpt_dir):
        return []
    return sorted(d for d in os.listdir(ckpt_dir)
                  if d.startswith("step_") and "tmp" not in d)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = _finished_steps(ckpt_dir)
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def restore_checkpoint(path: str, target: Dict[str, Any]) -> Dict[str, Any]:
    """Restore into the structure/shardings of `target` (an abstract or
    concrete state pytree): restored arrays land on the same mesh/sharding
    as the target's arrays."""
    import orbax.checkpoint as ocp

    def abstractify(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
        return x

    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(abstractify, target)
    return ckptr.restore(os.path.abspath(path), abstract)


def _gc_checkpoints(ckpt_dir: str, keep: int) -> None:
    import shutil
    for d in _finished_steps(ckpt_dir)[:-keep]:
        shutil.rmtree(os.path.join(ckpt_dir, d), ignore_errors=True)


# ---------------------------------------------------------------------------
# HF / torch import
# ---------------------------------------------------------------------------

def _load_torch_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch .pt/.bin/.safetensors file or an HF directory."""
    if os.path.isdir(path):
        sd: Dict[str, Any] = {}
        for fn in sorted(os.listdir(path)):
            full = os.path.join(path, fn)
            if fn.endswith(".safetensors"):
                from safetensors.torch import load_file
                sd.update(load_file(full))
            elif fn in ("pytorch_model.bin", "pytorch_model.pt"):
                import torch
                sd.update(torch.load(full, map_location="cpu",
                                     weights_only=True))
        if not sd:
            raise FileNotFoundError(f"no weights found in {path}")
        return sd
    import torch
    return torch.load(path, map_location="cpu", weights_only=True)


def load_hf_checkpoint(path: str, cfg, lora_merge: bool = True,
                       lora_alpha: float = 64.0, lora_r: int = 32
                       ) -> Dict[str, Any]:
    """torch checkpoint -> simlingo_tpu parameter tree.

    Handles both a raw InternVL2-1B checkpoint and a trained SimLingo
    checkpoint (DrivingModel state dict with vision_model./language_model./
    adaptors./wp_encoder. prefixes and peft-wrapped LLM).

    lora_merge=False keeps a peft-trained checkpoint's adapters UNMERGED:
    the returned tree carries `params["lora"]` in the
    qwen2.init_lora_params layout (for continued LoRA training from a
    trained checkpoint); the LLM base holds the raw base_layer weights.
    """
    from simlingo_tpu.core import hf_convert as C

    sd = _load_torch_state_dict(path)
    lora_tree = None
    if any(".lora_A." in k for k in sd):
        if lora_merge:
            sd = C.merge_lora_inplace(sd, alpha=lora_alpha, r=lora_r)
        else:
            lora_tree = C.lora_tree_from_torch(sd, cfg.llm.num_layers)
            sd = C.strip_peft_inplace(sd)

    keys = set(sd.keys())

    def has_prefix(p):
        return any(k.startswith(p) for k in keys)

    params: Dict[str, Any] = {}

    if has_prefix("vision_model.model.vision_model."):
        # SimLingo DrivingModel: vision_model.model = InternVLChatModel
        base = "vision_model.model."
        params["vision"] = C.vit_from_torch_remote(
            sd, cfg.vit, prefix=base + "vision_model.")
        params["vision"]["projector"] = C.projector_from_torch(
            sd, prefix=base + "mlp1.")
        llm_prefix = "language_model.model.model."
        params["llm"] = C.qwen2_from_torch(sd, cfg.llm, prefix=llm_prefix)
        params["adaptors"] = _adaptors_from_torch(sd, cfg)
        params["wp_encoder"] = _mlp_stack_from_torch(sd, "wp_encoder.mlp",
                                                     (0, 2, 4))
    elif has_prefix("vision_model."):
        # raw InternVL2 checkpoint (remote-code naming)
        params["vision"] = C.vit_from_torch_remote(sd, cfg.vit,
                                                   prefix="vision_model.")
        params["vision"]["projector"] = C.projector_from_torch(sd, "mlp1.")
        params["llm"] = C.qwen2_from_torch(sd, cfg.llm,
                                           prefix="language_model.model.")
    else:
        raise ValueError(f"unrecognized checkpoint layout: "
                         f"{sorted(list(keys))[:5]} ...")
    if lora_tree is not None and lora_tree["layers"]:
        params["lora"] = lora_tree
    return params


def _mlp_stack_from_torch(sd, prefix: str, layer_indices) -> Dict[str, Any]:
    from simlingo_tpu.core.hf_convert import _linear
    return {f"l{i}": _linear(sd, f"{prefix}.{idx}")
            for i, idx in enumerate(layer_indices)}


def _adaptors_from_torch(sd, cfg) -> Dict[str, Any]:
    from simlingo_tpu.core.hf_convert import _t
    p: Dict[str, Any] = {}
    if "adaptors.driving.query_embeds_wps" in sd:
        p["route_queries"] = _t(sd["adaptors.driving.query_embeds_wps"])
        p["route_head"] = _mlp_stack_from_torch(
            sd, "adaptors.driving.route_head", (0, 2, 4))
    p["speed_queries"] = _t(sd["adaptors.driving.query_embeds_speed"])
    p["speed_head"] = _mlp_stack_from_torch(
        sd, "adaptors.driving.speed_wps_head", (0, 2))
    return p
