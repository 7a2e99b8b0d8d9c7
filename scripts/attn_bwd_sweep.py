"""Sweep flash-attention BACKWARD block sizes on the real chip.

VERDICT-r4 item 2: the Pallas attention pair costs 99 ms of the 400 ms
step (fwd 37 / bwd 62). With the scoped-VMEM limit raised to 18 MiB
(bench.py _raise_scoped_vmem), re-tune the bwd kv-block / inner-q-block
choices for both production kernels:

  * ViT tower: lane-major head-pair path (bt_hd), B=12 tiles, T=1025
    (padded 1152), 16 heads, D=64, non-causal.
    Knobs: SIMLINGO_ATTN_LM_BWD_BLOCK_K / SIMLINGO_ATTN_LM_BWD_BLOCK_Q.
  * LLM: GQA-packed path, B=6, T=798 (padded 896), 14 q / 2 kv heads,
    causal. Knob: SIMLINGO_ATTN_BWD_BLOCK_K.

Each cell times jax.value_and_grad of sum(attention) wrt (q, k, v):
fwd+bwd together, device-readback synchronized, RTT-subtracted. dO is
already VMEM-resident in both kernels (full-T blocks), so block shape is
the remaining lever. Prints one JSON line per cell.

    python scripts/attn_bwd_sweep.py [vit] [llm]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SIMLINGO_ATTN_IMPL", "pallas")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compile_cache")

from bench import _raise_scoped_vmem  # noqa: E402

_raise_scoped_vmem()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def timed(fn, args, n=15, warmup=3):
    def sync(out):
        return float(jax.device_get(out[0]))
    try:
        for _ in range(warmup):
            out = fn(*args)
        sync(out)
    except Exception as e:  # compile failure is a data point
        return None, f"{type(e).__name__}: {str(e)[:160]}"
    lats = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        lats.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t0
    return float(max(np.percentile(lats, 50) - rtt, 1e-9) * 1e3), None


def main():
    from simlingo_tpu.kernels import flash_attention as fa

    key = jax.random.PRNGKey(0)
    which = set(sys.argv[1:]) or {"vit", "llm"}

    if "vit" in which:
        B, T, H, D = 12, 1025, 16, 64
        q = jax.random.normal(key, (B, T, H * D), jnp.bfloat16)
        k = jax.random.normal(key, (B, T, H * D), jnp.bfloat16)
        v = jax.random.normal(key, (B, T, H * D), jnp.bfloat16)

        def loss_vit(q, k, v):
            out = fa.flash_attention(q, k, v, causal=False,
                                     layout="bt_hd", num_heads=H)
            return jnp.sum(out.astype(jnp.float32))

        # padded T = 1152 = 9*128: divisor q blocks 128/384/576/1152,
        # kv blocks 1152 (single) / 576 / 384
        for bk in ("", "1152", "576", "384"):
            for bq in ("", "128", "384", "576"):
                os.environ.pop("SIMLINGO_ATTN_LM_BWD_BLOCK_K", None)
                os.environ.pop("SIMLINGO_ATTN_LM_BWD_BLOCK_Q", None)
                if bk:
                    os.environ["SIMLINGO_ATTN_LM_BWD_BLOCK_K"] = bk
                if bq:
                    os.environ["SIMLINGO_ATTN_LM_BWD_BLOCK_Q"] = bq
                fn = jax.jit(jax.value_and_grad(loss_vit, argnums=(0, 1, 2)))
                ms, err = timed(fn, (q, k, v))
                print(json.dumps({"exp": "attn_bwd_sweep", "shape": "vit",
                                  "bk": bk or "default",
                                  "bq": bq or "default",
                                  "ms": ms, "err": err}), flush=True)
                if bq == "" and bk == "" and err:
                    return      # default path broken: no point sweeping

    if "llm" in which:
        B, T, HQ, HK, D = 6, 798, 14, 2, 64
        q = jax.random.normal(key, (B, T, HQ, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, T, HK, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, T, HK, D), jnp.bfloat16)
        valid = jnp.ones((B, T), bool)

        def loss_llm(q, k, v):
            out = fa.flash_attention(q, k, v, valid, causal=True)
            return jnp.sum(out.astype(jnp.float32))

        # padded S = 1024: kv blocks 1024 (single) / 512 / 256 / 128
        for bk in ("", "1024", "512", "256", "128"):
            os.environ.pop("SIMLINGO_ATTN_BWD_BLOCK_K", None)
            if bk:
                os.environ["SIMLINGO_ATTN_BWD_BLOCK_K"] = bk
            fn = jax.jit(jax.value_and_grad(loss_llm, argnums=(0, 1, 2)))
            ms, err = timed(fn, (q, k, v))
            print(json.dumps({"exp": "attn_bwd_sweep", "shape": "llm",
                              "bk": bk or "default",
                              "ms": ms, "err": err}), flush=True)


if __name__ == "__main__":
    main()
