"""SimLingo-Base (CarLLaVA) stack: CLIP tower parity, base model fwd+loss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simlingo_tpu.models import clip_vit, resnet, simlingo_base
from simlingo_tpu.models.simlingo_base import SimLingoBaseConfig


def test_clip_vit_parity_with_hf():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        intermediate_size=128, image_size=56, patch_size=14,
        hidden_act="quick_gelu", attention_dropout=0.0)
    torch.manual_seed(0)
    model = CLIPVisionModel(hf_cfg).eval()

    cfg = clip_vit.CLIPViTConfig.tiny()
    sd = model.state_dict()

    # convert (native CLIP naming)
    def lin(prefix):
        p = {"w": sd[f"{prefix}.weight"].numpy().T}
        if f"{prefix}.bias" in sd:
            p["b"] = sd[f"{prefix}.bias"].numpy()
        return p

    vp = "vision_model."
    w = sd[vp + "embeddings.patch_embedding.weight"].numpy()
    o, i, kh, kw = w.shape
    params = {
        "patch_embed": {"w": w.transpose(2, 3, 1, 0).reshape(kh * kw * i, o)},
        "cls_token": sd[vp + "embeddings.class_embedding"].numpy(),
        "pos_embed": sd[vp + "embeddings.position_embedding.weight"].numpy(),
        "pre_ln": {"scale": sd[vp + "pre_layrnorm.weight"].numpy(),
                   "bias": sd[vp + "pre_layrnorm.bias"].numpy()},
        "layers": {},
        "projector": clip_vit.init_params(jax.random.PRNGKey(0),
                                          cfg)["projector"],
    }
    for li in range(cfg.num_layers):
        lp = f"{vp}encoder.layers.{li}."
        params["layers"][str(li)] = {
            "ln1": {"scale": sd[lp + "layer_norm1.weight"].numpy(),
                    "bias": sd[lp + "layer_norm1.bias"].numpy()},
            "ln2": {"scale": sd[lp + "layer_norm2.weight"].numpy(),
                    "bias": sd[lp + "layer_norm2.bias"].numpy()},
            "attn": {"q": lin(lp + "self_attn.q_proj"),
                     "k": lin(lp + "self_attn.k_proj"),
                     "v": lin(lp + "self_attn.v_proj"),
                     "o": lin(lp + "self_attn.out_proj")},
            "mlp": {"fc1": lin(lp + "mlp.fc1"), "fc2": lin(lp + "mlp.fc2")},
        }

    img = np.random.RandomState(0).randn(2, 3, 56, 56).astype(np.float32)
    with torch.no_grad():
        ref = model(pixel_values=torch.tensor(img),
                    output_hidden_states=True).hidden_states[-2].numpy()
    ours = clip_vit.encode(params, jnp.asarray(img.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=2e-4)


def test_llava_feature_shapes():
    cfg = clip_vit.CLIPViTConfig.tiny()   # grid 4
    params = clip_vit.init_params(jax.random.PRNGKey(0), cfg)
    newline = jnp.zeros((cfg.projector_out,))
    px = jax.random.normal(jax.random.PRNGKey(1), (2, 2, 56, 56, 3))
    feats = clip_vit.llava_features(params, px, cfg, newline, downsample=2)
    # grid 4 -> assembled 4x8 -> pooled 2x4 -> +newline col 2x5 = 10 tokens
    assert feats.shape == (2, 10, cfg.projector_out)
    assert np.isfinite(np.asarray(feats)).all()


def test_resnet_encoder():
    cfg = resnet.ResNetConfig(depth=18, width=16, token_size=32)
    params, state = resnet.init_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 128, 3))
    tokens, new_state = resnet.encode(params, state, x, cfg, training=True)
    assert tokens.shape == (2, 2 * 4, 32)   # 64/32 x 128/32 feature grid
    # training updates running stats
    assert not np.allclose(np.asarray(new_state["stem"]["mean"]),
                           np.asarray(state["stem"]["mean"]))


def test_base_model_forward_and_loss_improves():
    cfg = SimLingoBaseConfig.tiny()
    params = simlingo_base.init_params(jax.random.PRNGKey(0), cfg)
    B = 2
    px = jax.random.normal(jax.random.PRNGKey(1), (B, 2, 56, 56, 3)) * 0.1
    speed = jnp.asarray([3.0, 6.0])
    tps = jax.random.normal(jax.random.PRNGKey(2), (B, 2, 2)) * 5
    wps = jnp.cumsum(jnp.ones((B, 10, 2)) * 0.5, axis=1)
    route = jnp.cumsum(jnp.ones((B, 20, 2)) * 0.5, axis=1)

    out, preds = simlingo_base.forward_loss(params, px, speed, tps, wps,
                                            route, cfg)
    assert np.isfinite(float(out.loss))
    assert preds["route"].shape == (B, 20, 2)

    import optax
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    def loss_fn(p):
        o, _ = simlingo_base.forward_loss(p, px, speed, tps, wps, route, cfg)
        return o.loss

    p = params
    l0 = float(loss_fn(p))
    for _ in range(6):
        g = jax.grad(loss_fn)(p)
        updates, opt_state = opt.update(g, opt_state)
        p = optax.apply_updates(p, updates)
    assert float(loss_fn(p)) < l0

    infer = jax.jit(lambda p: simlingo_base.forward(p, px, speed, tps, cfg))
    preds2 = infer(p)
    assert preds2["speed_wps"].shape == (B, 10, 2)
