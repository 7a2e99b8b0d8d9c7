"""Chip queue r5b: all remaining no-remat lever cells, ONE process.

The r4l champion matrix established that remat=mlp OOMs at every batch
(the recompute cluster materializes the [B*2,1025,4096] ViT MLP temps
together, RAISING transient peak), so the live question is the no-remat
lever combos at batch 6. Every subprocess exit wedges the tunnel for
~30 min (docs/KNOWN_ISSUES.md), so this script runs every cell
sequentially IN-PROCESS: the SIMLINGO_* gates are read at trace time,
letting one process build a fresh step per cell; only the scoped-VMEM
limit is process-wide, pinned to the probed 24 MiB (the only limit at
which CE+V2 compiles; chip_vmem_probe 2026-08-21).

Cells (batch 6, no remat, 24 MiB scoped):
  1. CE=pallas + dropout-v2   (the probed champion candidate)
  2. dropout-v2 only          (relayout-removal lever alone)
  3. CE=pallas only
  4. LN=pallas only           (may compile-fail: pinned x residuals)
  5. LoRA-fused + dropout-v2
  6. all levers together (CE+V2+LN+LoRA-fused)
  7. champion re-check at 24 MiB (does the raised limit hurt defaults?)

One JSON line per cell; a compile failure is recorded as a cell result,
not a crash.  Usage: python scripts/tpu_queue_r5b.py [logfile] [wait_pid]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r5b.log"


def log_line(obj):
    line = json.dumps(obj)
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
        return True
    except OSError:
        return False


CELLS = [
    # value order; a wedge mid-process kills everything after it, and the
    # LN custom-VJP cell is the likeliest to misbehave -> late
    ("ce+v2", {"SIMLINGO_CE_IMPL": "pallas", "SIMLINGO_DROPOUT_V2": "1"}),
    ("v2", {"SIMLINGO_DROPOUT_V2": "1"}),
    ("ce", {"SIMLINGO_CE_IMPL": "pallas"}),
    ("lora_fused+v2", {"SIMLINGO_LORA_FUSED": "1",
                       "SIMLINGO_DROPOUT_V2": "1"}),
    ("defaults@24MiB", {}),
    ("ln", {"SIMLINGO_LN_IMPL": "pallas"}),
    ("all", {"SIMLINGO_CE_IMPL": "pallas", "SIMLINGO_DROPOUT_V2": "1",
             "SIMLINGO_LN_IMPL": "pallas", "SIMLINGO_LORA_FUSED": "1"}),
]
GATE_KEYS = ["SIMLINGO_CE_IMPL", "SIMLINGO_DROPOUT_V2", "SIMLINGO_LN_IMPL",
             "SIMLINGO_LORA_FUSED"]


def main():
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/jax_compile_cache")
    os.environ["BENCH_SCOPED_VMEM_KIB"] = "24576"
    os.environ.setdefault("SIMLINGO_ATTN_IMPL", "pallas")
    from bench import _raise_scoped_vmem
    _raise_scoped_vmem()

    import jax
    import jax.numpy as jnp

    from simlingo_tpu.core import presets
    from simlingo_tpu.data.synthetic import synthetic_example
    from simlingo_tpu.models import simlingo
    from simlingo_tpu.train import train_step as ts

    batch, steps = 6, 10
    cfg = presets.internvl2_1b(lora=True)
    import dataclasses
    cfg = dataclasses.replace(cfg, remat_vision=False, remat_llm=False)
    ex_host = synthetic_example(cfg, batch=batch, seq_len=768,
                                num_patches=2, seed=0)

    for tag, env in CELLS:
        for k in GATE_KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        t_start = time.time()
        try:
            params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
            mask = ts.trainable_mask(params, ts.production_trainable)
            opt = ts.make_masked_optimizer(
                ts.OptimizerConfig(lr=3e-5, total_steps=1000, grad_clip=0.3),
                mask)
            state = ts.init_train_state(params, opt, trainable_mask_tree=mask)
            del params
            step = ts.make_train_step(cfg, opt, compute_dtype=jnp.bfloat16,
                                      trainable_mask_tree=mask, donate=True)
            ex = jax.device_put(ex_host)
            rng = jax.random.PRNGKey(0)

            def sync(state):
                return float(jax.device_get(
                    state["params"]["adaptors"]["speed_queries"].sum()))

            for i in range(2):
                state, m = step(state, ex, jax.random.fold_in(rng, i))
            sync(state)
            t0 = time.perf_counter()
            for i in range(2, steps + 2):
                state, m = step(state, ex, jax.random.fold_in(rng, 100 + i))
            sync(state)
            total = time.perf_counter() - t0
            t1 = time.perf_counter()
            sync(state)
            rtt = time.perf_counter() - t1
            dt = max(total - rtt, 1e-9) / steps
            log_line({"exp": f"r5b {tag}", "samples_per_s": round(batch / dt, 3),
                      "step_ms": round(dt * 1e3, 1),
                      "loss": float(jax.device_get(m["loss"])),
                      "env": env, "wall_s": round(time.time() - t_start, 1)})
            del state, step, ex
        except Exception as e:  # compile failure is a data point
            log_line({"exp": f"r5b {tag}", "error": type(e).__name__,
                      "msg": str(e)[:300],
                      "env": env, "wall_s": round(time.time() - t_start, 1)})


if __name__ == "__main__":
    if len(sys.argv) > 2:
        prev = int(sys.argv[2])
        while _pid_alive(prev):
            time.sleep(60)
    log_line({"exp": "queue_r5b_start",
              "ts": time.strftime("%FT%TZ", time.gmtime())})
    main()
    log_line({"exp": "queue_r5b_done"})
