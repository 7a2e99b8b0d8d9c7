"""Training-step + sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from simlingo_tpu.data.synthetic import synthetic_example
from simlingo_tpu.models import simlingo
from simlingo_tpu.models.simlingo import SimLingoConfig
from simlingo_tpu.parallel import mesh as meshlib
from simlingo_tpu.train import train_step as ts


def test_train_step_reduces_loss_single_device():
    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    opt = ts.make_optimizer(ts.OptimizerConfig(lr=3e-3, total_steps=50,
                                               grad_clip=1.0))
    state = ts.init_train_state(params, opt)
    step = ts.make_train_step(cfg, opt, compute_dtype=jnp.float32)
    ex = synthetic_example(cfg, batch=2, seq_len=96, num_patches=1)
    rng = jax.random.PRNGKey(1)

    losses = []
    for i in range(6):
        state, m = step(state, ex, jax.random.fold_in(rng, i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_train_step_sharded_matches_replicated():
    """Same batch, 8-device (2,2,2) mesh vs single device: identical loss."""
    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    opt = ts.make_optimizer(ts.OptimizerConfig(lr=1e-3, total_steps=50,
                                               grad_clip=1.0))
    ex = synthetic_example(cfg, batch=8, seq_len=96, num_patches=1)
    rng = jax.random.PRNGKey(1)

    # single device
    state = ts.init_train_state(params, opt)
    step = ts.make_train_step(cfg, opt, compute_dtype=jnp.float32, donate=False)
    _, m_single = step(state, ex, rng)

    # sharded
    mesh = meshlib.make_mesh(dp=2, fsdp=2, tp=2)
    sharded_params = meshlib.shard_params(params, mesh)
    sharded_batch = jax.tree_util.tree_map(
        jax.device_put, ex, meshlib.batch_shardings(ex, mesh))
    state_s = ts.init_train_state(sharded_params, opt)
    new_state, m_sharded = step(state_s, sharded_batch, rng)

    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_sharded["loss"]), rtol=1e-4)
    # params actually sharded across devices
    w = new_state["params"]["llm"]["layers"]["0"]["mlp"]["gate"]["w"]
    assert not w.sharding.is_fully_replicated


def test_tp2_matches_tp1_loss_and_grads():
    """Tensor parallelism must be numerically inert: loss AND gradients on
    one batch agree between an unsharded run and a tp=2-only mesh (catches
    silent divergence that a loss-finiteness check would pass)."""
    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    ex = synthetic_example(cfg, batch=2, seq_len=96, num_patches=1)

    def loss_and_grads(p, batch):
        def loss_fn(p_, b_):
            out, _ = simlingo.forward_loss(p_, b_, cfg,
                                           compute_dtype=jnp.float32)
            return out.loss
        return jax.jit(jax.value_and_grad(loss_fn))(p, batch)

    l1, g1 = loss_and_grads(params, ex)

    mesh = meshlib.make_mesh(dp=1, fsdp=1, tp=2,
                             devices=jax.devices()[:2])
    p2 = meshlib.shard_params(params, mesh)
    ex2 = jax.tree_util.tree_map(jax.device_put, ex,
                                 meshlib.batch_shardings(ex, mesh))
    l2, g2 = loss_and_grads(p2, ex2)

    # something must actually be tp-sharded in this run
    specs = [x.sharding.spec for x in jax.tree_util.tree_leaves(p2)]
    assert any("tp" in str(s) for s in specs), specs
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for name, leaf1, leaf2 in [
        ("llm_q_w", g1["llm"]["layers"]["0"]["attn"]["q"]["w"],
         g2["llm"]["layers"]["0"]["attn"]["q"]["w"]),
        ("vit_fc1_w", g1["vision"]["layers"]["0"]["mlp"]["fc1"]["w"],
         g2["vision"]["layers"]["0"]["mlp"]["fc1"]["w"]),
        ("route_queries", g1["adaptors"]["route_queries"],
         g2["adaptors"]["route_queries"]),
    ]:
        a, b = np.asarray(leaf1), np.asarray(jax.device_get(leaf2))
        denom = np.maximum(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(a / denom, b / denom, atol=2e-5,
                                   err_msg=name)


def test_onecycle_schedule_shape():
    cfg = ts.OptimizerConfig(lr=3e-5, total_steps=1000, pct_start=0.05)
    sched = ts.onecycle_schedule(cfg)
    lr0 = float(sched(0))
    lr_peak = float(sched(50))
    lr_end = float(sched(999))
    assert abs(lr_peak - 3e-5) / 3e-5 < 1e-5
    assert lr0 < lr_peak and lr_end < lr0


def test_checkpoint_save_restore_roundtrip(tmp_path):
    from simlingo_tpu.core import checkpoint as ckpt
    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    opt = ts.make_optimizer(ts.OptimizerConfig(lr=1e-3, total_steps=10,
                                               grad_clip=1.0))
    state = ts.init_train_state(params, opt)
    step = ts.make_train_step(cfg, opt, compute_dtype=jnp.float32,
                              donate=False)
    ex = synthetic_example(cfg, batch=2, seq_len=96, num_patches=1)
    state, _ = step(state, ex, jax.random.PRNGKey(0))

    path = ckpt.save_checkpoint(str(tmp_path), state, step=1)
    restored = ckpt.restore_checkpoint(path, state)
    for (p1, a), (p2, b) in zip(
            jax.tree_util.tree_leaves_with_path(state),
            jax.tree_util.tree_leaves_with_path(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(p1))
    # continuing from the restored state works
    state2, m = step(restored, ex, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert ckpt.latest_checkpoint(str(tmp_path)) == path


def test_async_checkpoint_overlap_gc_and_idempotence(tmp_path):
    """block=False saves overlap training: back-to-back async saves stay
    ordered (one in flight), GC never touches an in-flight write, the final
    blocking save of the same step is idempotent, and restore sees the
    latest durable state."""
    import os

    from simlingo_tpu.core import checkpoint as ckpt

    d = str(tmp_path)
    state = {"w": jnp.arange(12.0).reshape(3, 4), "step": jnp.int32(0)}
    for s in (1, 2, 3):
        state = dict(state, step=jnp.int32(s))
        ckpt.save_checkpoint(d, state, s, keep=2, block=False)
    ckpt.wait_for_checkpoints()
    latest = ckpt.latest_checkpoint(d)
    assert latest.endswith("step_00000003")
    restored = ckpt.restore_checkpoint(latest, state)
    assert int(restored["step"]) == 3
    np.testing.assert_array_equal(np.asarray(restored["w"]),
                                  np.arange(12.0).reshape(3, 4))
    # final blocking save of an already-saved step: no-op, then GC prunes
    p = ckpt.save_checkpoint(d, state, 3, keep=2, block=True)
    assert p == latest
    assert ckpt.save_checkpoint(d, dict(state, step=jnp.int32(4)), 4,
                                keep=2, block=True).endswith("step_00000004")
    kept = sorted(x for x in os.listdir(d) if x.startswith("step_"))
    assert kept == ["step_00000003", "step_00000004"], kept


def test_blocking_save_retries_after_flaky_failure(tmp_path, monkeypatch):
    """A first-attempt orbax failure (flaky ocdbt finalize, observed
    2026-08-20: 'params are missing .zarray') leaves a poisoned tmp dir;
    the blocking save must clean it and succeed on the retry instead of
    destroying the training run."""
    import os

    import orbax.checkpoint as ocp

    from simlingo_tpu.core import checkpoint as ckpt

    d = str(tmp_path)
    state = {"w": jnp.arange(6.0).reshape(2, 3), "count": jnp.int32(7)}
    calls = {"n": 0}
    real = ocp.StandardCheckpointer

    class FlakyOnce(real):
        def save(self, path, *a, **kw):
            calls["n"] += 1
            if calls["n"] == 1:
                # simulate the failed attempt's leftover tmp dir too
                os.makedirs(os.path.join(
                    d, "step_00000007.orbax-checkpoint-tmp-123/x"))
                raise ValueError("Save failed: 1/2 params are missing "
                                 ".zarray in checkpoint: count.")
            return real.save(self, path, *a, **kw)

    monkeypatch.setattr(ocp, "StandardCheckpointer", FlakyOnce)
    p = ckpt.save_checkpoint(d, state, 7, block=True)
    assert calls["n"] == 2
    assert os.path.isdir(p)
    assert not [x for x in os.listdir(d) if "tmp" in x]
    restored = ckpt.restore_checkpoint(p, state)
    assert int(restored["count"]) == 7


def test_visualise_callback(tmp_path):
    """Reference-parity visualisation (VERDICT r2 #5): waypoint + route
    grids, text panel, projected camera overlay; log_image fan-out."""
    import os

    from simlingo_tpu.train.visualise import VisualiseCallback

    class CapturingLogger:
        def __init__(self):
            self.images = []

        def log_image(self, name, step, image):
            self.images.append((name, step, image.shape))

    cfg = SimLingoConfig.tiny()
    params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    ex = synthetic_example(cfg, batch=2, seq_len=96, num_patches=1)
    _, preds = simlingo.forward_loss(params, ex, cfg)
    lg = CapturingLogger()
    viz = VisualiseCallback(1, str(tmp_path), logger=lg)
    paths = viz.maybe_plot(1, ex, preds,
                           language_pred=["turn left", "stop now"])
    assert paths and all(os.path.getsize(p) > 1000 for p in paths)
    names = {n for n, _, _ in lg.images}
    assert {"visualise/waypoints", "visualise/route",
            "visualise/camera"} <= names
    kinds = {os.path.basename(p).split("_")[1] for p in paths}
    assert {"waypoints", "route", "camera"} <= kinds


def test_camera_overlay_golden(tmp_path):
    """PNG golden test (VERDICT r2 #5): projecting known BEV waypoints
    through the calibrated camera draws pixels at the expected locations."""
    import os

    import cv2

    from simlingo_tpu.train.visualise import camera_overlay
    from simlingo_tpu.utils.geometry import project_points

    img = np.zeros((512, 1024, 3), np.uint8)
    wps = np.stack([np.linspace(4, 12, 10), np.linspace(0, 1.0, 10)], 1)
    gt = np.stack([np.linspace(4, 12, 10), np.linspace(0, -1.0, 10)], 1)
    out = camera_overlay(img, wps, gt)
    assert out.shape == img.shape and out.any()

    # drawn markers sit where the pinhole projection says they should
    uv = project_points(np.concatenate([wps, np.zeros((10, 1))], 1))
    for u, v in uv:
        patch = out[max(int(v) - 5, 0):int(v) + 6,
                    max(int(u) - 5, 0):int(u) + 6]
        assert patch.any(), f"no marker near ({u:.0f}, {v:.0f})"
    # forward points project onto the lower half (ground below horizon)
    assert np.all(uv[:, 1] > 256)
    # pred (right, +y) drawn right of GT (left, -y)
    uv_gt = project_points(np.concatenate([gt, np.zeros((10, 1))], 1))
    assert uv[-1, 0] > uv_gt[-1, 0]

    # byte-stable golden: same inputs -> identical PNG (determinism of the
    # projection + cv2 raster); golden regenerated on first run
    golden = os.path.join(os.path.dirname(__file__), "goldens",
                          "camera_overlay.png")
    if not os.path.exists(golden):
        os.makedirs(os.path.dirname(golden), exist_ok=True)
        cv2.imwrite(golden, out[..., ::-1])          # store as BGR
    ref = cv2.imread(golden, cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(out[..., ::-1], ref)


def test_bf16_training_tracks_fp32():
    """SURVEY hard part #4: bf16 compute (no loss scaling) must track fp32
    loss trajectories on the debug config."""
    cfg = SimLingoConfig.tiny()
    ex = synthetic_example(cfg, batch=2, seq_len=96, num_patches=1)
    ocfg = ts.OptimizerConfig(lr=1e-3, total_steps=20, grad_clip=1.0)

    def run(dtype):
        params = simlingo.init_params(jax.random.PRNGKey(0), cfg)
        opt = ts.make_optimizer(ocfg)
        state = ts.init_train_state(params, opt)
        step = ts.make_train_step(cfg, opt, compute_dtype=dtype, donate=False)
        losses = []
        for i in range(4):
            state, m = step(state, ex, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        return np.asarray(losses)

    l32 = run(jnp.float32)
    l16 = run(jnp.bfloat16)
    assert np.isfinite(l16).all()
    # same direction and within a loose band of the fp32 trajectory
    assert l16[-1] < l16[0]
    np.testing.assert_allclose(l16, l32, rtol=0.15)
