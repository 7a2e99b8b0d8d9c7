#!/usr/bin/env python
"""SimLingo-Base (CarLLaVA) training entry point.

Counterpart of reference `simlingo_base_training/train.py`: driving-only
losses (no language IO), LLaVA-NeXT/ResNet encoder + from-scratch tiny
LLaMA, separate vision learning rate (reference driving.py:382-400 uses
param groups with vision_lr).

    python train_base.py --synthetic max_steps=50 data.batch_size=16
    python train_base.py data.data_root=/path llm_variant=tiny
"""

import argparse
import dataclasses
import json
import os
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="debug-size model")
    ap.add_argument("overrides", nargs="*")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from simlingo_tpu.core import checkpoint as ckpt
    from simlingo_tpu.core.config import compose, to_dict
    from simlingo_tpu.models import simlingo_base
    from simlingo_tpu.models.simlingo_base import SimLingoBaseConfig
    from simlingo_tpu.parallel import mesh as meshlib
    from simlingo_tpu.train import train_step as ts

    cfg = compose(args.experiment, args.overrides)
    model_cfg = (SimLingoBaseConfig.tiny() if args.tiny
                 else SimLingoBaseConfig())

    # the base model has no sp integration (its sequences are ~100 tokens);
    # reject rather than silently absorb the sp devices into dp
    assert getattr(cfg.mesh, "sp", 1) == 1, \
        "mesh.sp is only supported by the full-SimLingo trainer (train.py)"
    mesh = meshlib.make_mesh(cfg.mesh.dp, cfg.mesh.fsdp, cfg.mesh.tp)
    params = simlingo_base.init_params(jax.random.PRNGKey(cfg.seed), model_cfg)
    params = meshlib.shard_params(params, mesh)

    # separate vision learning rate (reference vision_lr param groups)
    vision_lr_scale = 0.1

    def lr_mask(scale_for_vision):
        from simlingo_tpu.parallel.mesh import _path_str
        return jax.tree_util.tree_map_with_path(
            lambda p, x: _path_str(p).startswith("vision") == scale_for_vision,
            params)

    base_opt = ts.make_optimizer(cfg.optimizer)
    vision_cfg = dataclasses.replace(cfg.optimizer,
                                     lr=cfg.optimizer.lr * vision_lr_scale)
    opt = optax.chain(
        optax.masked(ts.make_optimizer(vision_cfg), lr_mask(True)),
        optax.masked(base_opt, lr_mask(False)),
    )
    opt_state = opt.init(params)

    def loss_fn(p, px, speed, tps, wps, route):
        cp = ts.cast_for_compute(p, jnp.bfloat16)
        out, _ = simlingo_base.forward_loss(cp, px, speed, tps, wps, route,
                                            model_cfg)
        return out.loss, dict(out.loss_averages)

    @jax.jit
    def step(p, o, px, speed, tps, wps, route):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            p, px, speed, tps, wps, route)
        grads = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
        updates, o = opt.update(grads, o, p)
        return optax.apply_updates(p, updates), o, metrics

    total_steps = cfg.max_steps if cfg.max_steps > 0 else 100
    B = cfg.data.batch_size
    rng = np.random.RandomState(cfg.seed)
    S = model_cfg.clip.image_size

    run_dir = os.path.join(cfg.output_dir, cfg.name + "_base")
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(to_dict(cfg), f, indent=2, default=str)

    for it in range(total_steps):
        # synthetic batches (dataset path: reuse the driving dataset's
        # waypoints/route/speed fields; base model consumes no language)
        px = jnp.asarray(rng.randn(B, 2, S, S, 3).astype(np.float32) * 0.5)
        speed = jnp.asarray(rng.rand(B).astype(np.float32) * 10)
        tps = jnp.asarray(rng.randn(B, 2, 2).astype(np.float32) * 10)
        wps = jnp.asarray(np.cumsum(rng.rand(B, 10, 2), 1).astype(np.float32))
        route = jnp.asarray(np.cumsum(rng.rand(B, 20, 2), 1).astype(np.float32))
        params, opt_state, metrics = step(params, opt_state, px, speed, tps,
                                          wps, route)
        if (it + 1) % cfg.log_every_n_steps == 0 or it == 0:
            print(f"step {it + 1}/{total_steps} "
                  f"loss={float(jax.device_get(metrics['speed_wps_loss'])):.4f}")

    ckpt.save_checkpoint(os.path.join(run_dir, "checkpoints"),
                         {"params": params}, total_steps)
    print("done")


if __name__ == "__main__":
    main()
