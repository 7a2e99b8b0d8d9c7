"""Decode-matmul microbench: bf16 vs int8 vs int4 layouts at the w4a16
decode shape (one LLM MLP up-proj row, M=1). Usage:
  timeout 300 python scripts/mb_int4.py bf16 int8 grouped evenodd dense
Each variant prints ms/iter with readback sync (see docs/BENCH_NOTES.md
for the block_until_ready caveat on this backend)."""
import jax, jax.numpy as jnp, numpy as np, time, sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from jax import lax
K, N, G = 4864, 896, 38
k = K // G
key = jax.random.PRNGKey(0)
w = jax.random.normal(key, (K, N), jnp.float32)
from simlingo_tpu.kernels.quantized_matmul import quantize_weight4, quantize_weight, unpack_int4
p4, s4 = quantize_weight4(w, axis=1, group=128)
w8, s8 = quantize_weight(w, axis=1)
wb16 = w.astype(jnp.bfloat16)
x = jnp.ones((1, K), jnp.bfloat16)

def loop(body, n=100):
    def f(x0):
        def it(i, acc):
            y = body(acc)
            return acc + jnp.pad(y, ((0,0),(0,K-y.shape[1]))).astype(acc.dtype) * 1e-9
        return lax.fori_loop(0, n, it, x0)
    jf = jax.jit(f)
    r = jf(x); float(jax.device_get(r.sum()))
    t0 = time.perf_counter(); r = jf(x); float(jax.device_get(r.sum()))
    return (time.perf_counter() - t0) / n * 1e3

def v_bf16(acc):
    return acc @ lax.optimization_barrier(wb16)

def v_int8(acc):
    wb = lax.optimization_barrier(w8).astype(jnp.bfloat16)
    y = acc @ wb
    return (y.astype(jnp.float32) * s8).astype(jnp.bfloat16)

def v_int4_grouped(acc):
    from simlingo_tpu.kernels.quantized_matmul import int4_matmul
    return int4_matmul(acc, p4, s4).astype(jnp.bfloat16)

def v_int4_evenodd(acc):
    pb = lax.optimization_barrier(p4)
    wlo = ((pb << 4) >> 4).astype(jnp.bfloat16).reshape(G, k//2, N)
    whi = (pb >> 4).astype(jnp.bfloat16).reshape(G, k//2, N)
    x2 = acc.reshape(1, G, k)
    xe = x2[:, :, 0::2].transpose(1, 0, 2)
    xo = x2[:, :, 1::2].transpose(1, 0, 2)
    yg = lax.dot_general(xe, wlo, (((2,),(1,)),((0,),(0,))), preferred_element_type=jnp.float32) \
       + lax.dot_general(xo, whi, (((2,),(1,)),((0,),(0,))), preferred_element_type=jnp.float32)
    return (yg * s4[:, None, :]).sum(0).astype(jnp.bfloat16)

def v_int4_dense(acc):
    pb = lax.optimization_barrier(p4)
    w8f = unpack_int4(pb, axis=0).astype(jnp.bfloat16)
    x2 = acc.reshape(1, G, k).transpose(1, 0, 2)
    yg = lax.dot_general(x2, w8f.reshape(G, k, N), (((2,),(1,)),((0,),(0,))), preferred_element_type=jnp.float32)
    return (yg * s4[:, None, :]).sum(0).astype(jnp.bfloat16)

VARIANTS = dict(bf16=v_bf16, int8=v_int8, grouped=v_int4_grouped,
                evenodd=v_int4_evenodd, dense=v_int4_dense)
for name in sys.argv[1:]:
    print(f"{name:10s} {loop(VARIANTS[name]):.4f} ms/iter", flush=True)
