"""Component-level step-time attribution on the real TPU chip.

Times (device-readback-synchronized, like bench.py):
  * flash attention kernel alone (ViT shape, LLM shape), fwd and fwd+bwd
  * ViT extract_features fwd and fwd+bwd
  * Qwen2 forward fwd and fwd+bwd (with LoRA)
  * full train step

Usage: python scripts/profile_step.py [component ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SIMLINGO_ATTN_IMPL", "pallas")

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, n=10, warmup=2):
    """Mean wall time in ms over n back-to-back dispatches, one readback
    sync at the end (the tunnel's ~25 ms RTT would otherwise dominate
    per-call timing)."""
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
    # subtract one sync RTT (measured on the already-synced value)
    t1 = time.perf_counter()
    sync(out)
    rtt = time.perf_counter() - t1
    return float(max(total - rtt, 1e-9) / n * 1e3)


def report(name, ms, flops=None):
    extra = ""
    if flops is not None:
        extra = f"  {flops / (ms * 1e-3) / 1e12:7.1f} TFLOP/s ({flops/1e12:.2f} TF)"
    print(f"{name:<44s} {ms:8.2f} ms{extra}", flush=True)


def attn_bench():
    from simlingo_tpu.kernels import flash_attention as fa
    key = jax.random.PRNGKey(0)

    for tag, (B, T, HQ, HK, D, causal) in {
        "vit (12,1025,16,16,64,nc)": (12, 1025, 16, 16, 64, False),
        "llm (6,798,14,2,64,c)": (6, 798, 14, 2, 64, True),
    }.items():
        q = jax.random.normal(key, (B, T, HQ, D), jnp.bfloat16)
        k = jax.random.normal(key, (B, T, HK, D), jnp.bfloat16)
        v = jax.random.normal(key, (B, T, HK, D), jnp.bfloat16)
        valid = jnp.ones((B, T), bool)

        f = jax.jit(lambda q, k, v: fa.flash_attention(q, k, v, valid,
                                                       causal=causal))
        fl = 4 * T * T * D * HQ * B * (0.5 if causal else 1.0)
        report(f"attn fwd {tag}", timed(f, q, k, v), fl)

        def loss(q, k, v):
            return fa.flash_attention(q, k, v, valid, causal=causal).astype(
                jnp.float32).sum()
        g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        report(f"attn fwd+bwd {tag}", timed(g, q, k, v), fl * 3.5)


def vit_bench():
    from simlingo_tpu.core import presets
    from simlingo_tpu.models import vit

    cfg = presets.internvl2_1b(lora=True).vit
    params = vit.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    imgs = jax.random.normal(jax.random.PRNGKey(1), (12, 448, 448, 3),
                             jnp.bfloat16)
    # matmul flops per token fwd: 2 * 300M params
    n_tok = 1025
    fl = 2 * 300e6 * n_tok * 12
    attn_fl = 4 * n_tok * n_tok * 64 * 16 * 24 * 12

    f = jax.jit(lambda p, x: vit.extract_features(p, x, cfg, remat=False))
    report("vit fwd (12 tiles)", timed(f, params, imgs), fl + attn_fl)

    for remat in (False, True):
        def loss(p, x, remat=remat):
            return vit.extract_features(p, x, cfg, remat=remat).astype(
                jnp.float32).sum()
        g = jax.jit(jax.grad(loss))
        mult = 4 if remat else 3
        report(f"vit fwd+bwd remat={remat}", timed(g, params, imgs),
               fl * 3 + attn_fl * 3.5)


def llm_bench():
    from simlingo_tpu.core import presets
    from simlingo_tpu.models import qwen2

    full = presets.internvl2_1b(lora=True)
    cfg = full.llm
    params = qwen2.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    lora = qwen2.init_lora_params(jax.random.PRNGKey(1), cfg, jnp.bfloat16)
    B, T = 6, 798
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, 896), jnp.bfloat16)
    pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    valid = jnp.ones((B, T), bool)
    # non-embedding matmul params ~= 24 * (896*1152 + 896*896 + 3*896*4864)
    pcount = 24 * (896 * (896 + 128 + 128) + 896 * 896 + 3 * 896 * 4864)
    fl = 2 * pcount * B * T

    f = jax.jit(lambda p, lo, x: qwen2.forward(p, x, cfg, pos, valid,
                                               lora_params=lo)[0])
    report("llm fwd (6,798) +lora", timed(f, params, lora, x), fl)

    def loss(lo, x, p):
        # frozen base (stop-grad), grads wrt lora + activations like training
        p = jax.lax.stop_gradient(p)
        return qwen2.forward(p, x, cfg, pos, valid, lora_params=lo)[0].astype(
            jnp.float32).sum()
    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    report("llm fwd+bwd(frozen base, lora+dx)",
           timed(g, lora, x, params), fl * 2.2)


def step_bench():
    from simlingo_tpu.core import presets
    from simlingo_tpu.data.synthetic import synthetic_example
    from simlingo_tpu.models import simlingo
    from simlingo_tpu.train import train_step as ts
    import dataclasses

    cfg = presets.internvl2_1b(lora=True)
    cfg = dataclasses.replace(cfg, remat_llm=False)
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    mask = ts.trainable_mask(params, ts.production_trainable)
    opt = ts.make_masked_optimizer(
        ts.OptimizerConfig(lr=3e-5, total_steps=1000, grad_clip=0.3), mask)
    state = ts.init_train_state(params, opt, trainable_mask_tree=mask)
    del params
    step = ts.make_train_step(cfg, opt, compute_dtype=jnp.bfloat16,
                              trainable_mask_tree=mask, donate=False)
    ex = jax.device_put(synthetic_example(cfg, batch=6, seq_len=768,
                                          num_patches=2, seed=0))
    rng = jax.random.PRNGKey(0)
    ms = timed(lambda s: step(s, ex, rng)[0]["params"]["adaptors"], state,
               n=5, warmup=2)
    report("full train step (b6)", ms)
    print(f"  => {6 / (ms / 1e3):.2f} samples/s")


ALL = {"attn": attn_bench, "vit": vit_bench, "llm": llm_bench,
       "step": step_bench}


def _step_setup(dropout: bool = True):
    import dataclasses
    from simlingo_tpu.core import presets
    from simlingo_tpu.data.synthetic import synthetic_example
    from simlingo_tpu.models import simlingo
    from simlingo_tpu.train import train_step as ts

    cfg = presets.internvl2_1b(lora=True)
    cfg = dataclasses.replace(cfg, remat_vision=False, remat_llm=False)
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    mask = ts.trainable_mask(params, ts.production_trainable)
    opt = ts.make_masked_optimizer(
        ts.OptimizerConfig(lr=3e-5, total_steps=1000, grad_clip=0.3), mask)
    state = ts.init_train_state(params, opt, trainable_mask_tree=mask)
    ex = jax.device_put(synthetic_example(cfg, batch=6, seq_len=768,
                                          num_patches=2, seed=0))
    rng = jax.random.PRNGKey(0) if dropout else None

    def loss_of(trainable, frozen, batch, rng):
        p = ts.merge_params(trainable, frozen)
        cp = ts.cast_for_compute(p, jnp.bfloat16)
        out, _ = simlingo.forward_loss(cp, batch, cfg, dropout_rng=rng,
                                       compute_dtype=jnp.bfloat16)
        return out.loss

    return cfg, opt, mask, state, ex, rng, loss_of, ts


def stepfwd_bench():
    """Forward loss only (one jitted program -- run parts separately to stay
    within HBM)."""
    cfg, opt, mask, state, ex, rng, loss_of, ts = _step_setup()
    trainable, frozen = ts.partition_params(state["params"], mask)
    fwd = jax.jit(loss_of)
    report("step: fwd loss only", timed(fwd, trainable, frozen, ex, rng, n=6))


def stepgrad_bench():
    """Forward + backward, grads kept live (no optimizer)."""
    cfg, opt, mask, state, ex, rng, loss_of, ts = _step_setup()
    trainable, frozen = ts.partition_params(state["params"], mask)

    # return the grads tree itself so XLA cannot dead-code the backward
    # (timed() syncs on one leaf; the rest stay on-device)
    vg = jax.jit(lambda t, f, b, r: jax.grad(loss_of)(t, f, b, r))
    report("step: fwd+bwd (grads)",
           timed(lambda *a: vg(*a)["adaptors"]["speed_queries"],
                 trainable, frozen, ex, rng, n=6))


def stepfull_bench():
    """Full donate'd train step (fwd+bwd+optimizer)."""
    cfg, opt, mask, state, ex, rng, loss_of, ts = _step_setup()
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
    report("step: full (fwd+bwd+opt)", ms)
    print(f"  => {6 / (ms / 1e3):.2f} samples/s", flush=True)


ALL["stepfwd"] = stepfwd_bench
ALL["stepgrad"] = stepgrad_bench
ALL["stepfull"] = stepfull_bench


if __name__ == "__main__":
    which = sys.argv[1:] or list(ALL)
    for w in which:
        ALL[w]()
