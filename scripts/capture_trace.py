"""Capture an xplane trace of the champion train step and print the top ops.

Runs the exact bench.py configuration (batch 6, no remat, bf16, Pallas
attention) for a few profiled steps on the real chip, then attributes
device time with scripts/parse_trace.py. Used to re-target the per-step
tail after each optimization lands (docs/BENCH_NOTES.md keeps history).

Usage: python scripts/capture_trace.py [outdir] [top_n]
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SIMLINGO_ATTN_IMPL", "pallas")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

import bench

bench._raise_scoped_vmem()          # before jax init (plugin snapshots env)

import jax
import jax.numpy as jnp

from simlingo_tpu.core import presets
from simlingo_tpu.data.synthetic import synthetic_example
from simlingo_tpu.models import simlingo
from simlingo_tpu.train import train_step as ts


def main(outdir="/tmp/xplane_trace", top_n=40):
    batch = int(os.environ.get("BENCH_BATCH", "6"))
    cfg = presets.internvl2_1b(lora=True)
    cfg = dataclasses.replace(cfg, remat_vision=False, remat_llm=False)
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    mask = ts.trainable_mask(params, ts.production_trainable)
    opt = ts.make_masked_optimizer(
        ts.OptimizerConfig(lr=3e-5, total_steps=1000, grad_clip=0.3), mask)
    state = ts.init_train_state(params, opt, trainable_mask_tree=mask)
    del params
    step = ts.make_train_step(cfg, opt, compute_dtype=jnp.bfloat16,
                              trainable_mask_tree=mask, donate=True)
    ex = jax.device_put(synthetic_example(cfg, batch=batch, seq_len=768,
                                          num_patches=2, seed=0))

    def sync(state):
        return float(jax.device_get(
            state["params"]["adaptors"]["speed_queries"].sum()))

    rng = jax.random.PRNGKey(0)
    for i in range(2):                                   # compile + warm
        state, _ = step(state, ex, jax.random.fold_in(rng, i))
    sync(state)

    with jax.profiler.trace(outdir):
        for i in range(3):
            state, _ = step(state, ex, jax.random.fold_in(rng, 100 + i))
        sync(state)
    print(f"trace written to {outdir}", flush=True)

    from scripts import parse_trace
    parse_trace.main(outdir, top_n)


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["/tmp/xplane_trace"]),
         *(int(a) for a in sys.argv[2:3]))
