"""Pipeline parallelism (parallel/pipeline.py): stacked layout + GPipe ring.

Parity contract: the pp-sharded pipeline computes EXACTLY the math of the
sequential decoder (same layers, same order), so with dropout off the
outputs and gradients must match the legacy dict-layout forward to float32
tolerance on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simlingo_tpu.models import qwen2
from simlingo_tpu.parallel import mesh as meshlib
from simlingo_tpu.parallel import pipeline as pl


def _setup(num_layers=4, B=4, T=16, lora=False, seed=0):
    cfg = qwen2.Qwen2Config.tiny()
    import dataclasses
    cfg = dataclasses.replace(cfg, num_layers=num_layers,
                              lora_r=8 if lora else 0,
                              lora_alpha=16 if lora else 0,
                              lora_dropout=0.0)
    params = qwen2.init_params(jax.random.PRNGKey(seed), cfg)
    lora_params = (qwen2.init_lora_params(jax.random.PRNGKey(seed + 1), cfg)
                   if lora else None)
    if lora:
        # B starts at zero (peft init) => LoRA would be invisible; randomize
        lora_params = jax.tree_util.tree_map(
            lambda x: jax.random.normal(jax.random.PRNGKey(3), x.shape,
                                        x.dtype) * 0.05, lora_params)
    k = jax.random.PRNGKey(seed + 2)
    x = jax.random.normal(k, (B, T, cfg.hidden_size), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(T), (B, T)).astype(jnp.int32)
    # ragged validity exercises the kv mask through the pipeline
    lengths = jnp.asarray([T, T - 3, T - 1, T - 7][:B])
    valid = jnp.arange(T)[None, :] < lengths[:, None]
    return cfg, params, lora_params, x, pos, valid


def _ref(cfg, params, lora_params, x, pos, valid):
    out, _ = qwen2.forward(params, x, cfg, pos, kv_valid=valid, causal=True,
                           lora_params=lora_params)
    return out


def _stacked(params, lora_params):
    sp = dict(params, layers=pl.stack_layer_tree(params["layers"]))
    slo = (dict(lora_params, layers=pl.stack_layer_tree(lora_params["layers"]))
           if lora_params is not None else None)
    return sp, slo


def test_stack_unstack_roundtrip():
    cfg, params, _, _, _, _ = _setup()
    stk = pl.stack_layer_tree(params["layers"])
    assert pl.is_stacked(stk) and not pl.is_stacked(params["layers"])
    back = pl.unstack_layer_tree(stk)
    jax.tree_util.tree_map(np.testing.assert_array_equal,
                           params["layers"], back)


def test_stacked_sequential_matches_dict_layout():
    cfg, params, lora_params, x, pos, valid = _setup(lora=True)
    ref = _ref(cfg, params, lora_params, x, pos, valid)
    sp, slo = _stacked(params, lora_params)
    out, _ = qwen2.forward(sp, x, cfg, pos, kv_valid=valid, causal=True,
                           lora_params=slo)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("pp,microbatches", [(2, 0), (2, 4), (4, 0)])
def test_pipeline_forward_parity(pp, microbatches):
    cfg, params, lora_params, x, pos, valid = _setup(lora=True)
    ref = _ref(cfg, params, lora_params, x, pos, valid)
    sp, slo = _stacked(params, lora_params)
    mesh = meshlib.make_mesh(dp=8 // pp, pp=pp)
    with pl.pipeline_parallel(mesh, microbatches=microbatches):
        out, _ = jax.jit(lambda p, lo, xx: qwen2.forward(
            p, xx, cfg, pos, kv_valid=valid, causal=True,
            lora_params=lo))(sp, slo, x)
        assert pl.trace_count() > 0, "pipeline never engaged"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_no_lora():
    cfg, params, _, x, pos, valid = _setup(lora=False)
    ref = _ref(cfg, params, None, x, pos, valid)
    sp, _ = _stacked(params, None)
    mesh = meshlib.make_mesh(dp=4, pp=2)
    with pl.pipeline_parallel(mesh):
        out, _ = jax.jit(lambda p, xx: qwen2.forward(
            p, xx, cfg, pos, kv_valid=valid, causal=True))(sp, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("remat", [True, False])
def test_pipeline_grad_parity(remat):
    cfg, params, lora_params, x, pos, valid = _setup(lora=True)
    sp, slo = _stacked(params, lora_params)

    def loss_stacked(p, lo, xx):
        out, _ = qwen2.forward(p, xx, cfg, pos, kv_valid=valid, causal=True,
                               lora_params=lo)
        return (out.astype(jnp.float32) ** 2).mean()

    # reference grads: stacked layout, sequential (no pp context)
    ref_g = jax.grad(loss_stacked, argnums=(0, 1))(sp, slo, x)

    mesh = meshlib.make_mesh(dp=4, pp=2)
    with pl.pipeline_parallel(mesh, remat=remat):
        pp_g = jax.jit(jax.grad(loss_stacked, argnums=(0, 1)))(sp, slo, x)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        ref_g, pp_g)


def test_train_step_pp2_matches_sequential():
    """Full SimLingo train step on a dp=2/fsdp=2/pp=2 mesh: the pipelined
    step's loss matches the stacked-sequential step's on the same params."""
    from simlingo_tpu.data.synthetic import synthetic_example
    from simlingo_tpu.models import simlingo
    from simlingo_tpu.models.simlingo import SimLingoConfig
    from simlingo_tpu.train import train_step as ts

    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    params["llm"] = dict(params["llm"],
                         layers=pl.stack_layer_tree(params["llm"]["layers"]))
    if "lora" in params:
        params["lora"] = dict(params["lora"], layers=pl.stack_layer_tree(
            params["lora"]["layers"]))
    opt = ts.make_optimizer(ts.OptimizerConfig(lr=1e-3, total_steps=50,
                                               grad_clip=1.0))
    ex = synthetic_example(cfg, batch=8, seq_len=96, num_patches=1)
    rng = jax.random.PRNGKey(1)

    state = ts.init_train_state(params, opt)
    step = ts.make_train_step(cfg, opt, compute_dtype=jnp.float32,
                              donate=False)
    _, m_seq = step(state, ex, rng)

    mesh = meshlib.make_mesh(dp=2, fsdp=2, pp=2)
    sharded_params = meshlib.shard_params(params, mesh)
    sharded_batch = jax.tree_util.tree_map(
        jax.device_put, ex, meshlib.batch_shardings(ex, mesh))
    state_p = ts.init_train_state(sharded_params, opt)
    with pl.pipeline_parallel(mesh):
        step_p = ts.make_train_step(cfg, opt, compute_dtype=jnp.float32,
                                    donate=False)
        new_state, m_pp = step_p(state_p, sharded_batch, rng)
        assert pl.trace_count() > 0

    np.testing.assert_allclose(float(m_seq["loss"]), float(m_pp["loss"]),
                               rtol=1e-4)
    # stacked layer leaves actually split dim 0 over pp
    w = new_state["params"]["llm"]["layers"]["mlp"]["gate"]["w"]
    assert not w.sharding.is_fully_replicated


def test_pipeline_microbatch_fallback_on_indivisible_batch():
    # B=3 with pp=2: requested M=2 doesn't divide; falls back to M=3? no --
    # largest divisor of 3 that is <= 2 is 1 (a single microbatch still
    # pipelines across stages, just with a full bubble)
    cfg, params, _, x, pos, valid = _setup(B=3, lora=False)
    ref = _ref(cfg, params, None, x, pos, valid)
    sp, _ = _stacked(params, None)
    mesh = meshlib.make_mesh(dp=4, pp=2)
    with pl.pipeline_parallel(mesh):
        out, _ = qwen2.forward(sp, x, cfg, pos, kv_valid=valid, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
