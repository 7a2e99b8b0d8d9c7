"""One-off full-step timing experiments on the real chip.

Usage: python scripts/step_experiments.py <variant>
Variants: base, nodrop, rbg, b12, b12remat
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SIMLINGO_ATTN_IMPL", "pallas")

import jax
import jax.numpy as jnp


def run(variant):
    from simlingo_tpu.core import presets
    from simlingo_tpu.data.synthetic import synthetic_example
    from simlingo_tpu.models import simlingo
    from simlingo_tpu.train import train_step as ts

    batch = 6
    remat_vision = False
    cfg = presets.internvl2_1b(lora=True)
    cfg = dataclasses.replace(cfg, remat_vision=False, remat_llm=False)
    use_rng = True

    if variant == "nodrop":
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, lora_dropout=0.0))
        use_rng = False
    elif variant == "rbg":
        pass  # rng impl switched below
    elif variant == "b12":
        batch = 12
    elif variant == "b12remat":
        batch = 12
        cfg = dataclasses.replace(cfg, remat_vision=True)

    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    mask = ts.trainable_mask(params, ts.production_trainable)
    opt = ts.make_masked_optimizer(
        ts.OptimizerConfig(lr=3e-5, total_steps=1000, grad_clip=0.3), mask)
    state = ts.init_train_state(params, opt, trainable_mask_tree=mask)
    del params
    ex = jax.device_put(synthetic_example(cfg, batch=batch, seq_len=768,
                                          num_patches=2, seed=0))
    if variant == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")
    rng = jax.random.PRNGKey(0) if use_rng else None

    step = ts.make_train_step(cfg, opt, compute_dtype=jnp.bfloat16,
                              trainable_mask_tree=mask, donate=True)
    out = step(state, ex, rng)[0]
    float(jax.device_get(out["params"]["adaptors"]["speed_queries"].sum()))
    t0 = time.perf_counter()
    n = 6
    for _ in range(n):
        out = step(out, ex, rng)[0]
    float(jax.device_get(out["params"]["adaptors"]["speed_queries"].sum()))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"[{variant}] step {ms:.2f} ms => {batch / (ms / 1e3):.2f} samples/s",
          flush=True)


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else "base")
