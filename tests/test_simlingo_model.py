"""End-to-end tests of the composed SimLingo VLA model (tiny config, CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from simlingo_tpu.data.synthetic import synthetic_example
from simlingo_tpu.models import simlingo
from simlingo_tpu.models.simlingo import SimLingoConfig


def _setup(seed=0, batch=2, seq_len=96, left_pad=False):
    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(seed), cfg)
    ex = synthetic_example(cfg, batch, seq_len, num_patches=1,
                           seed=seed, left_pad=left_pad)
    return cfg, params, ex


def test_forward_loss_runs_and_is_finite():
    cfg, params, ex = _setup()
    out, preds = simlingo.forward_loss(params, ex, cfg)
    assert np.isfinite(float(out.loss))
    assert set(out.loss_averages) == {"language_loss", "route_loss",
                                      "speed_wps_loss"}
    assert preds["route"].shape == (2, 20, 2)
    assert preds["speed_wps"].shape == (2, 10, 2)


def test_gradients_flow_everywhere():
    cfg, params, ex = _setup()

    def loss_fn(p):
        out, _ = simlingo.forward_loss(p, ex, cfg)
        return out.loss

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    dead = [jax.tree_util.keystr(path) for path, g in leaves
            if not np.isfinite(np.asarray(g)).all()
            or (np.asarray(g) == 0).all()]
    # position embeddings for unused patches etc. may legitimately be zero;
    # but core projections must receive gradient.
    critical = [k for k in dead if any(
        s in k for s in ("attn", "mlp", "route_head", "speed_head",
                         "wp_encoder", "patch_embed"))]
    assert not critical, f"zero/nan grads in: {critical}"


def test_pad_invariance():
    """Extending the sequence with extra pad slots must not change the loss."""
    cfg, params, ex = _setup(seq_len=96)
    out1, _ = simlingo.forward_loss(params, ex, cfg)

    # re-pad to a longer static length
    lbl = ex.driving_input.prompt
    pad = 32
    def extend(x, fill=0):
        widths = [(0, 0), (0, pad)] + [(0, 0)] * (x.ndim - 2)
        return jnp.pad(x, widths, constant_values=fill)
    lbl2 = lbl.replace(ids=extend(lbl.ids), valid=extend(lbl.valid),
                       loss_mask=extend(lbl.loss_mask))
    ex2 = ex.replace(driving_input=ex.driving_input.replace(
        prompt=lbl2, prompt_inference=lbl2))
    out2, _ = simlingo.forward_loss(params, ex2, cfg)
    np.testing.assert_allclose(float(out1.loss), float(out2.loss),
                               rtol=2e-5, atol=2e-5)


def test_invalid_tokens_do_not_affect_loss():
    cfg, params, ex = _setup()
    lbl = ex.driving_input.prompt
    # scribble over invalid slots
    ids2 = jnp.where(lbl.valid, lbl.ids, 7)
    lbl2 = lbl.replace(ids=ids2)
    ex2 = ex.replace(driving_input=ex.driving_input.replace(
        prompt=lbl2, prompt_inference=lbl2))
    out1, _ = simlingo.forward_loss(params, ex, cfg)
    out2, _ = simlingo.forward_loss(params, ex2, cfg)
    np.testing.assert_allclose(float(out1.loss), float(out2.loss),
                               rtol=1e-6)

    # scribbling over a VALID question token must change the language loss
    b0_first_valid = int(np.argmax(np.asarray(lbl.valid[0])))
    ids3 = lbl.ids.at[0, b0_first_valid + 1].set(11)
    lbl3 = lbl.replace(ids=ids3)
    ex3 = ex.replace(driving_input=ex.driving_input.replace(
        prompt=lbl3, prompt_inference=lbl3))
    out3, _ = simlingo.forward_loss(params, ex3, cfg)
    assert abs(float(out1.loss) - float(out3.loss)) > 1e-6


def test_left_pad_equals_right_pad():
    """Same content, left- vs right-padded, must give identical losses
    (validates the static-layout equivalence claim in core/structs.py)."""
    cfg, params, ex_r = _setup(seed=3, left_pad=False)
    _, _, ex_l = _setup(seed=3, left_pad=True)
    out_r, pr = simlingo.forward_loss(params, ex_r, cfg)
    out_l, pl_ = simlingo.forward_loss(params, ex_l, cfg)
    np.testing.assert_allclose(float(out_r.loss), float(out_l.loss),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pr["route"]), np.asarray(pl_["route"]),
                               rtol=2e-4, atol=2e-4)


def test_gathered_ce_equals_full_ce():
    """max_answer_len gathered CE must equal the full-sequence CE."""
    import dataclasses
    cfg_full = dataclasses.replace(SimLingoConfig.tiny(), max_answer_len=0)
    cfg_gather = dataclasses.replace(SimLingoConfig.tiny(), max_answer_len=48)
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg_full)
    ex = synthetic_example(cfg_full, batch=3, seq_len=96, num_patches=1,
                           seed=11)
    out_f, _ = simlingo.forward_loss(params, ex, cfg_full)
    out_g, _ = simlingo.forward_loss(params, ex, cfg_gather)
    np.testing.assert_allclose(
        float(out_f.loss_averages["language_loss"]),
        float(out_g.loss_averages["language_loss"]), rtol=1e-5)
    assert int(out_f.loss_counts["language_loss"]) \
        == int(out_g.loss_counts["language_loss"])


def test_speed_wps_1d_mode():
    """1d waypoint mode: speed head emits [B, 10, 1]; loss vs waypoints_1d."""
    import dataclasses
    cfg = dataclasses.replace(SimLingoConfig.tiny(), speed_wps_mode="1d")
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    ex = synthetic_example(cfg, batch=2, seq_len=96, num_patches=1)
    out, preds = simlingo.forward_loss(params, ex, cfg)
    assert preds["speed_wps"].shape == (2, 10, 1)
    assert np.isfinite(float(out.loss))


def test_remat_modes_grad_identical():
    """remat=False / True / "mlp" are pure memory-schedule choices: the
    loss and every gradient must be bit-comparable (same ops, same order
    inside each layer; only WHEN values are (re)computed differs)."""
    import dataclasses

    grads = {}
    for mode in (False, True, "mlp"):
        cfg, params, ex = _setup()
        cfg = dataclasses.replace(cfg, remat_vision=mode)

        def loss_fn(p):
            out, _ = simlingo.forward_loss(p, ex, cfg)
            return out.loss

        l, g = jax.value_and_grad(loss_fn)(params)
        grads[mode] = (float(l), g)

    l0, g0 = grads[False]
    for mode in (True, "mlp"):
        l1, g1 = grads[mode]
        assert abs(l0 - l1) < 1e-6
        for (kp, a), (_, b) in zip(
                jax.tree_util.tree_leaves_with_path(g0),
                jax.tree_util.tree_leaves_with_path(g1)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-6,
                err_msg=f"remat={mode} grad mismatch at {kp}")
