"""On-chip validation + timing of the fused Pallas CE at production shape.

Parity: fused_ce vs the XLA logsumexp/gather reference at
[N=960, H=896, V=151674] bf16 (the batch-6 gathered-answer CE), forward
and dh. Timing: 50-iter readback-synced loops of fwd and fwd+bwd for
both implementations.

Usage: timeout 900 python scripts/chip_ce_check.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from simlingo_tpu.kernels.fused_ce import fused_ce

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    jax.config.update("jax_platforms", "cpu")   # site hook pins axon,cpu

N = int(os.environ.get("MB_CE_N", "960"))
H = int(os.environ.get("MB_CE_H", "896"))
V = int(os.environ.get("MB_CE_V", "151674"))
ITERS = int(os.environ.get("MB_CE_ITERS", "50"))

h2 = jax.random.normal(jax.random.PRNGKey(0), (N, H), jnp.bfloat16)
w = (jax.random.normal(jax.random.PRNGKey(1), (V, H), jnp.float32)
     * 0.02).astype(jnp.bfloat16)
labels = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, V)
gmask = jnp.linspace(0.2, 1.7, N, dtype=jnp.float32)


def ref_ce(h, lab, ww):
    logits = (h @ ww.T).astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, lab[:, None], axis=-1)[:, 0]
    return logz - gold


# parity
ce_f = jax.jit(fused_ce)(h2, labels, w)
ce_r = jax.jit(ref_ce)(h2, labels, w)
np.testing.assert_allclose(np.asarray(ce_f), np.asarray(ce_r),
                           rtol=1e-3, atol=1e-3)
print(f"OK fwd parity (max |d| = "
      f"{float(jnp.abs(ce_f - ce_r).max()):.2e})")

# w/labels/gmask must be jit ARGUMENTS: a closed-over [V, H] array embeds
# a ~272 MB constant in the HLO and the axon remote-compile endpoint
# rejects the upload (HTTP 413)
g_f = jax.jit(jax.grad(lambda h, lab, ww, gm: (
    fused_ce(h, lab, ww).astype(jnp.float32) * gm).sum()))(
        h2, labels, w, gmask)
g_r = jax.jit(jax.grad(lambda h, lab, ww, gm: (
    ref_ce(h, lab, ww) * gm).sum()))(h2, labels, w, gmask)
d = jnp.abs(g_f.astype(jnp.float32) - g_r.astype(jnp.float32)).max()
scale = jnp.abs(g_r.astype(jnp.float32)).max()
assert float(d) <= 0.02 * max(float(scale), 1e-6), (float(d), float(scale))
print(f"OK grad parity (max |d| = {float(d):.2e}, ref max {float(scale):.2e})")


def timeit(f, *args):
    jf = jax.jit(f)
    r = jf(*args)
    float(jax.device_get(jnp.asarray(r).astype(jnp.float32).sum()))
    t0 = time.perf_counter()
    r = jf(*args)
    float(jax.device_get(jnp.asarray(r).astype(jnp.float32).sum()))
    return (time.perf_counter() - t0) / ITERS * 1e3


def loop_simple(body):
    # fold the [N] ce back into the [N, H] carry so iterations are serial;
    # lab/ww/gm stay jit arguments (see HTTP-413 note above)
    def f(x0, lab, ww, gm):
        def it(_, acc):
            y = body(acc, lab, ww, gm)           # [N]
            return acc + y[:, None].astype(acc.dtype) * 1e-9
        return jax.lax.fori_loop(0, ITERS, it, x0)
    return f


for name, impl in (("fused", fused_ce), ("xla", ref_ce)):
    t_f = timeit(loop_simple(lambda a, lab, ww, gm, i=impl: i(a, lab, ww)),
                 h2, labels, w, gmask)
    grad_body = jax.grad(
        lambda h, lab, ww, gm, i=impl: (
            i(h, lab, ww).astype(jnp.float32) * gm).sum())
    t_b = timeit(loop_simple(
        lambda a, lab, ww, gm, g=grad_body: g(a, lab, ww, gm)[:, 0]),
        h2, labels, w, gmask)
    print(f"ce-{name:5s} fwd {t_f:7.3f} ms/iter   fwd+bwd {t_b:7.3f} ms/iter",
          flush=True)
print("ALL OK")
