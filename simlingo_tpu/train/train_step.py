"""pjit'd training step: fused forward + backward + optimizer update.

Counterpart of the reference training runtime (SURVEY.md section 2.4):
Lightning + DeepSpeed ZeRO-2, AdamW lr 3e-5 betas(0.9,0.999) wd, OneCycleLR
pct_start 0.05, grad clip 0.3, fp16 loss scale 32
(reference train.py:160-214, driving.py:718-732, config.py:74-104).

TPU re-design: one compiled program per step; bf16 compute with fp32 master
params and fp32 optimizer state (no loss scaling needed); sharding is
declared on params/batch and XLA emits the collectives.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from simlingo_tpu.core.structs import DrivingExample, TrainingOutput
from simlingo_tpu.models import simlingo
from simlingo_tpu.models.simlingo import SimLingoConfig


@dataclasses.dataclass(frozen=True)
class OptimizerConfig:
    lr: float = 3e-5
    weight_decay: float = 0.1
    betas: Tuple[float, float] = (0.9, 0.999)
    pct_start: float = 0.05            # OneCycle warmup fraction
    grad_clip: float = 0.3
    total_steps: int = 10_000
    # peak/initial/final lr ratios follow torch OneCycleLR defaults
    div_factor: float = 25.0
    final_div_factor: float = 1e4


def onecycle_schedule(cfg: OptimizerConfig) -> optax.Schedule:
    """torch.optim.lr_scheduler.OneCycleLR (cos strategy) equivalent.

    Built from explicit warmup + cosine segments: optax's
    cosine_onecycle_schedule produces NaN when total_steps * pct_start < 1
    (zero-length interval), which small smoke runs hit.
    """
    warmup = max(1, int(round(cfg.total_steps * cfg.pct_start)))
    decay = max(1, cfg.total_steps - warmup)
    init = cfg.lr / cfg.div_factor
    final = init / cfg.final_div_factor
    return optax.join_schedules([
        optax.linear_schedule(init, cfg.lr, warmup),
        optax.cosine_decay_schedule(cfg.lr, decay, alpha=final / cfg.lr),
    ], [warmup])


def make_optimizer(cfg: OptimizerConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=onecycle_schedule(cfg),
            b1=cfg.betas[0], b2=cfg.betas[1],
            weight_decay=cfg.weight_decay,
        ),
    )


def partition_params(params: Any, mask: Any) -> Tuple[Any, Any]:
    """Split a param tree into (trainable, frozen) by a bool mask tree.

    The complement positions hold None; merge_params recombines. Keeping the
    frozen tower (the 0.5B base LLM) entirely OUT of the differentiated /
    optimizer-visible tree -- instead of stop_gradient + masked optimizer --
    means no zero-gradient arrays, no fp32 casts, and no optimizer traffic
    for frozen leaves ever exist in the compiled step.
    """
    trainable = jax.tree_util.tree_map(lambda m, p: p if m else None,
                                       mask, params)
    frozen = jax.tree_util.tree_map(lambda m, p: None if m else p,
                                    mask, params)
    return trainable, frozen


def merge_params(trainable: Any, frozen: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda a, b: b if a is None else a, trainable, frozen,
        is_leaf=lambda x: x is None)


def init_train_state(params: Any, opt: optax.GradientTransformation,
                     trainable_mask_tree: Optional[Any] = None
                     ) -> Dict[str, Any]:
    """Optimizer state exists only for trainable leaves (ZeRO-friendly analog
    of the reference's peft-frozen base model). Frozen leaves are stored in
    bf16 (see cast_frozen) -- they never take updates."""
    if trainable_mask_tree is None:
        tr = params
    else:
        params = cast_frozen(params, trainable_mask_tree)
        tr, _ = partition_params(params, trainable_mask_tree)
    return {
        "params": params,
        "opt_state": opt.init(tr),
        "step": jnp.zeros((), jnp.int32),
    }


def cast_for_compute(params: Any, dtype=jnp.bfloat16) -> Any:
    """fp32 master -> bf16 compute copy (norm internals stay fp32)."""
    return jax.tree_util.tree_map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, params)


def cast_frozen(params: Any, trainable_mask_tree: Any,
                dtype=jnp.bfloat16) -> Any:
    """Store FROZEN leaves in the compute dtype.

    The frozen base LLM never takes optimizer updates, so an fp32 master for
    it only wastes HBM (~1.3 GB for the 0.5B base at batch-limiting scale);
    the HF checkpoint it comes from is bf16-native anyway. Trainable leaves
    keep their fp32 master (cast_for_compute makes the bf16 compute copy).
    """
    return jax.tree_util.tree_map(
        lambda m, p: p if m or p.dtype != jnp.float32 else p.astype(dtype),
        trainable_mask_tree, params)


def production_trainable(path: str) -> bool:
    """The reference's trainable set (simlingo_seed1.yaml): full vision tower,
    LoRA adapters, driving adaptors, waypoint encoder; base LLM frozen."""
    return not path.startswith("llm/")


def trainable_mask(params: Any, trainable_fn: Callable[[str], bool]) -> Any:
    from simlingo_tpu.parallel.mesh import _path_str
    return jax.tree_util.tree_map_with_path(
        lambda path, x: trainable_fn(_path_str(path)), params)


def make_masked_optimizer(cfg: OptimizerConfig, mask: Any = None
                          ) -> optax.GradientTransformation:
    """Kept for API compatibility: freezing is now done by partitioning the
    param tree (see partition_params), so the optimizer is unmasked -- it
    only ever sees trainable leaves."""
    del mask
    return make_optimizer(cfg)


def make_train_step(model_cfg: SimLingoConfig, opt: optax.GradientTransformation,
                    compute_dtype=jnp.bfloat16,
                    donate: bool = True,
                    trainable_mask_tree: Optional[Any] = None
                    ) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, metrics).

    With `trainable_mask_tree` (bool pytree matching params), the param tree
    is partitioned: only trainable leaves are differentiated and visible to
    the optimizer (init the state with the same mask via init_train_state).
    """
    from simlingo_tpu.core import gates
    if gates.ce_impl() == "pallas":
        # SIMLINGO_CE_IMPL=pallas: the VJP returns zero dW (the LM head is
        # the FROZEN tied embedding in the production config). If the
        # embedding is trainable, the CE-head gradient term would be
        # silently dropped -- refuse to build such a step; pallas_dw is the
        # full-finetune variant that streams the real dW per vocab tile.
        def _embed_trainable(tree) -> bool:
            try:
                sub = tree["llm"]["embed"]
            except (KeyError, TypeError):
                return trainable_mask_tree is None
            return any(bool(m) for m in jax.tree_util.tree_leaves(sub))
        if trainable_mask_tree is None or _embed_trainable(trainable_mask_tree):
            raise ValueError(
                "SIMLINGO_CE_IMPL=pallas requires a FROZEN llm/embed (the "
                "fused CE computes no dW for the tied LM head). Freeze the "
                "base LLM (production_trainable), use "
                "SIMLINGO_CE_IMPL=pallas_dw (streams the real dW), or "
                "unset SIMLINGO_CE_IMPL.")

    def loss_fn(trainable, frozen, batch: DrivingExample, rng):
        params = (merge_params(trainable, frozen) if frozen is not None
                  else trainable)
        cparams = cast_for_compute(params, compute_dtype)
        out, _ = simlingo.forward_loss(cparams, batch, model_cfg,
                                       dropout_rng=rng,
                                       compute_dtype=compute_dtype)
        metrics = dict(out.loss_averages)
        metrics["loss"] = out.loss
        return out.loss, metrics

    def train_step(state, batch: DrivingExample, rng):
        if trainable_mask_tree is not None:
            trainable, frozen = partition_params(state["params"],
                                                 trainable_mask_tree)
        else:
            trainable, frozen = state["params"], None
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, frozen, batch, rng)
        grads = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), grads)
        updates, new_opt_state = opt.update(grads, state["opt_state"],
                                            trainable)
        new_trainable = optax.apply_updates(trainable, updates)
        new_params = (merge_params(new_trainable, frozen)
                      if trainable_mask_tree is not None else new_trainable)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = dict(state)
        new_state.update(params=new_params, opt_state=new_opt_state,
                         step=state["step"] + 1)
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model_cfg: SimLingoConfig,
                   compute_dtype=jnp.bfloat16) -> Callable:
    def eval_step(params, batch: DrivingExample):
        cparams = cast_for_compute(params, compute_dtype)
        out, preds = simlingo.forward_loss(cparams, batch, model_cfg,
                                           compute_dtype=compute_dtype)
        metrics = dict(out.loss_averages)
        metrics["loss"] = out.loss
        return metrics, preds
    return jax.jit(eval_step)
