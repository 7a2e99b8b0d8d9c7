"""Find a scoped-VMEM config that compiles the CE+V2 train step.

Raising the scoped limit invites XLA to stage MORE operands in VMEM
(observed: 16 MiB limit -> 16.07M alloc; 18 MiB -> 20.07M), so the right
setting is empirical. Each candidate runs in a SUBPROCESS (LIBTPU_INIT_ARGS
is snapshotted at plugin init) that compiles the batch-6 CE+V2 step and
runs two steps; first success wins and is printed as JSON.

Candidates: 24/32 MiB limits, then the default limit with the bwd-attention
kv-split forced (SIMLINGO_ATTN_BWD_BLOCK_K=512).

Usage: python scripts/chip_vmem_probe.py [batch]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BATCH = sys.argv[1] if len(sys.argv) > 1 else "6"

INNER = r"""
import os, time
import jax, jax.numpy as jnp
from simlingo_tpu.core import presets
from simlingo_tpu.data.synthetic import synthetic_example
from simlingo_tpu.models import simlingo
from simlingo_tpu.train import train_step as ts

batch = int(os.environ.get("BENCH_BATCH", "6"))
cfg = presets.internvl2_1b(lora=True)
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
rng = jax.random.PRNGKey(1)
state, m = step(state, ex, rng)
print("loss0", float(jax.device_get(m["loss"])), flush=True)
t0 = time.perf_counter()
state, m = step(state, ex, rng)
print("loss1", float(jax.device_get(m["loss"])),
      "step_s", round(time.perf_counter() - t0, 3), flush=True)
print("PROBE_OK", flush=True)
"""


def main():
    cands = [
        {"BENCH_SCOPED_VMEM_KIB": "24576"},
        {"BENCH_SCOPED_VMEM_KIB": "32768"},
        {"BENCH_SCOPED_VMEM_KIB": "0", "SIMLINGO_ATTN_BWD_BLOCK_K": "512"},
    ]
    for cand in cands:
        env = dict(os.environ,
                   JAX_COMPILATION_CACHE_DIR="/tmp/jax_compile_cache",
                   SIMLINGO_ATTN_IMPL="pallas",
                   SIMLINGO_CE_IMPL="pallas",
                   SIMLINGO_DROPOUT_V2="1",
                   BENCH_BATCH=BATCH, **cand)
        kib = int(cand.get("BENCH_SCOPED_VMEM_KIB", "0"))
        if kib:
            env["LIBTPU_INIT_ARGS"] = (
                env.get("LIBTPU_INIT_ARGS", "")
                + f" --xla_tpu_scoped_vmem_limit_kib={kib}").strip()
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", INNER], env=env,
                               cwd=REPO, capture_output=True, timeout=1500)
        except subprocess.TimeoutExpired:
            print(json.dumps({"cand": cand, "error": "timeout"}), flush=True)
            continue
        out = r.stdout.decode(errors="replace")
        ok = "PROBE_OK" in out
        rec = {"cand": cand, "ok": ok, "rc": r.returncode,
               "wall_s": round(time.time() - t0, 1),
               "out": out.strip().splitlines()[-3:]}
        if not ok:
            err = r.stderr.decode(errors="replace")
            for ln in err.splitlines():
                if "Scoped allocation" in ln or "vmem" in ln.lower():
                    rec["vmem_line"] = ln[-220:]
                    break
        print(json.dumps(rec), flush=True)
        if ok:
            return
    print(json.dumps({"error": "no candidate compiled"}), flush=True)


if __name__ == "__main__":
    main()
