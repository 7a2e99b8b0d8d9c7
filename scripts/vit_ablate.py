"""ViT step-time ablation on the real chip: replace one component at a time
with a cheap stand-in and diff against the full tower. The deltas attribute
fwd+bwd time to attention / GELU / layernorm / layer-scale, guiding kernel
work (numbers land in docs/BENCH_NOTES.md).

Usage: python scripts/vit_ablate.py [full noattn gelu_tanh nonorm]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SIMLINGO_ATTN_IMPL", "pallas")

import jax
import jax.numpy as jnp


def timed(fn, *args, n=8, warmup=2):
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


def main(which):
    from simlingo_tpu.core import presets
    from simlingo_tpu.models import vit
    from simlingo_tpu.models import layers as L
    from simlingo_tpu.kernels import flash_attention as fa

    cfg = presets.internvl2_1b(lora=True).vit
    params = vit.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (12, 448, 448, 3),
                             jnp.bfloat16)

    # vit.py binds `attention` at import time -- patch vit's reference, not
    # the kernels module's
    orig_attention = vit.attention
    orig_gelu = jax.nn.gelu
    orig_ln = L.layernorm

    def run(tag):
        def loss(p, x):
            return vit.extract_features(p, x, cfg, remat=False).astype(
                jnp.float32).sum()
        g = jax.jit(jax.grad(loss))
        ms = timed(g, params, imgs)
        print(f"vit fwd+bwd [{tag:<10s}] {ms:8.2f} ms", flush=True)
        return ms

    if "full" in which:
        run("full")

    if "noattn" in which:
        # attention -> scaled value pass-through (keeps shapes + a matmul-free
        # datapath); the delta vs full is the attention kernel's in-context cost
        vit.attention = lambda q, k, v, *a, **kw: v if q.shape == v.shape else \
            jnp.repeat(v, q.shape[2] // v.shape[2], axis=2)
        try:
            run("noattn")
        finally:
            vit.attention = orig_attention

    if "gelu_tanh" in which:
        # layers.py calls jax.nn.gelu(h, approximate=False) explicitly --
        # the stand-in must IGNORE the caller's kwarg to actually switch
        jax.nn.gelu = lambda x, approximate=False: orig_gelu(x, approximate=True)
        try:
            run("gelu_tanh")
        finally:
            jax.nn.gelu = orig_gelu

    if "nonorm" in which:
        L.layernorm = lambda p, x, eps=1e-6: x
        vit.L.layernorm = L.layernorm
        try:
            run("nonorm")
        finally:
            L.layernorm = orig_ln
            vit.L.layernorm = orig_ln


if __name__ == "__main__":
    main(sys.argv[1:] or ["full", "noattn", "gelu_tanh", "nonorm"])
