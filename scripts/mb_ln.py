"""LayerNorm/RMSNorm microbench: XLA norm vs Pallas fused kernel at the
model's production shapes (ViT LN: [6*1025, 1024] x 48 calls/step; LLM
RMSNorm: [6*798, 896] x 49 calls/step). Times fwd and fwd+bwd with a
matmul consumer so XLA's norm->matmul operand fusion (the thing the
Pallas call boundary gives up) is priced in. Usage:

  timeout 600 python scripts/mb_ln.py [ln rms] [--fwd-only]

Each line: ms/iter with readback sync (block_until_ready caveat on this
backend: docs/BENCH_NOTES.md)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the session site hook pins jax_platforms to "axon,cpu" regardless of the
# env var; honor JAX_PLATFORMS=cpu explicitly so CPU smokes never touch the
# (possibly busy/wedged) TPU tunnel
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax import lax

from simlingo_tpu.kernels.layernorm import layernorm_fused, rmsnorm_fused

ITERS = int(os.environ.get("MB_LN_ITERS", "50"))


def timeit(f, *args):
    jf = jax.jit(f)
    r = jf(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    t0 = time.perf_counter()
    r = jf(*args)
    jax.tree_util.tree_map(lambda a: a.block_until_ready(), r)
    return (time.perf_counter() - t0) / ITERS * 1e3


def xla_ln(x, scale, bias, eps=1e-6):
    xf = x.astype(jnp.float32)
    mean = xf.mean(-1, keepdims=True)
    xc = xf - mean
    var = (xc * xc).mean(-1, keepdims=True)
    y = xc * lax.rsqrt(var + eps) * scale + bias
    return y.astype(x.dtype)


def xla_rms(x, scale, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = (xf * xf).mean(-1, keepdims=True)
    return (xf * lax.rsqrt(var + eps) * scale).astype(x.dtype)


def bench_norm(name, n, d, mk_xla, mk_pallas, fwd_only=False):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, d), jnp.bfloat16)
    w = jax.random.normal(key, (d, d), jnp.bfloat16)  # consumer matmul

    def loop_fwd(norm):
        def f(x0):
            def it(_, acc):
                y = norm(acc)
                return (acc + (y @ w) * 1e-9).astype(acc.dtype)
            return lax.fori_loop(0, ITERS, it, x0)
        return f

    def loop_bwd(norm):
        # grad wrt x through norm + consumer, looped
        def step(xi):
            return ((norm(xi) @ w).astype(jnp.float32) ** 2).sum() * 1e-9
        g = jax.grad(step)
        def f(x0):
            def it(_, acc):
                return (acc + g(acc).astype(acc.dtype) * 1e-3).astype(acc.dtype)
            return lax.fori_loop(0, ITERS, it, x0)
        return f

    for impl, mk in (("xla", mk_xla), ("pallas", mk_pallas)):
        norm = mk(d)
        t_f = timeit(loop_fwd(norm), x)
        line = f"{name}-{impl:6s} [{n}x{d}] fwd {t_f:7.4f} ms/iter"
        if not fwd_only:
            t_b = timeit(loop_bwd(norm), x)
            line += f"   fwd+bwd {t_b:7.4f} ms/iter"
        print(line, flush=True)


def main(argv):
    which = [a for a in argv if not a.startswith("-")] or ["ln", "rms"]
    fwd_only = "--fwd-only" in argv
    if "ln" in which:
        d = 1024
        scale = jnp.ones((d,), jnp.float32)
        bias = jnp.zeros((d,), jnp.float32)
        bench_norm(
            "ln", 6 * 1025, d,
            lambda d_: (lambda x: xla_ln(x, scale, bias)),
            lambda d_: (lambda x: layernorm_fused(x, scale, bias)),
            fwd_only)
    if "rms" in which:
        d = 896
        scale = jnp.ones((d,), jnp.float32)
        bench_norm(
            "rms", 6 * 798, d,
            lambda d_: (lambda x: xla_rms(x, scale)),
            lambda d_: (lambda x: rmsnorm_fused(x, scale)),
            fwd_only)


if __name__ == "__main__":
    main(sys.argv[1:])
