"""Sweep flash-attention fwd block sizes on the real chip (ViT + LLM shapes)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SIMLINGO_ATTN_IMPL", "pallas")

import jax
import jax.numpy as jnp


def timed(fn, *args, n=20, warmup=3):
    def sync(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    total = time.perf_counter() - t0
    t1 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t1
    return float(max(total - rtt, 1e-9) / n * 1e3)


def main():
    from simlingo_tpu.kernels import flash_attention as fa
    key = jax.random.PRNGKey(0)

    for tag, (B, T, HQ, HK, D, causal) in {
        "vit nc": (12, 1025, 16, 16, 64, False),
        "llm c": (6, 798, 14, 2, 64, True),
    }.items():
        q = jax.random.normal(key, (B, T, HQ, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, T, HK, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, T, HK, D), jnp.bfloat16)
        valid = jnp.ones((B, T), bool)
        fl = 4 * T * T * D * HQ * B * (0.5 if causal else 1.0)
        for bq in (128, 256, 512, None):
            for bk in (128, 256, 512, None):
                try:
                    f = jax.jit(lambda q, k, v, bq=bq, bk=bk: fa.flash_attention(
                        q, k, v, valid, causal=causal, block_q=bq, block_k=bk))
                    ms = timed(f, q, k, v)
                    print(f"{tag}  bq={str(bq):>5s} bk={str(bk):>5s}  "
                          f"{ms:7.3f} ms  {fl/(ms*1e-3)/1e12:6.1f} TF/s",
                          flush=True)
                except Exception as e:
                    print(f"{tag}  bq={bq} bk={bk}  FAIL {type(e).__name__}",
                          flush=True)


if __name__ == "__main__":
    main()
