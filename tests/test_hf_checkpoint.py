"""HF/torch checkpoint import: remote-code InternVL2 naming + LoRA merge +
trained-SimLingo layout -> our parameter tree -> working forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from simlingo_tpu.core import checkpoint as ckpt
from simlingo_tpu.core import hf_convert as C
from simlingo_tpu.models.qwen2 import Qwen2Config
from simlingo_tpu.models.simlingo import SimLingoConfig
from simlingo_tpu.models.vit import ViTConfig


def _tiny_cfg():
    return SimLingoConfig(
        vit=ViTConfig(hidden_size=32, num_layers=2, num_heads=2,
                      intermediate_size=64, image_size=28, patch_size=14,
                      projector_out=48),
        llm=Qwen2Config(vocab_size=128, hidden_size=48, num_layers=2,
                        num_heads=4, num_kv_heads=2, head_dim=12,
                        intermediate_size=96),
        img_context_token_id=100,
        remat_vision=False, remat_llm=False)


def _make_remote_code_state_dict(cfg, prefix=""):
    """Torch state dict in OpenGVLab remote-code naming."""
    t = torch.randn
    H = cfg.vit.hidden_size
    Hl = cfg.llm.hidden_size
    D = cfg.llm.head_dim
    sd = {}
    vp = prefix + "vision_model."
    sd[vp + "embeddings.patch_embedding.weight"] = t(H, 3, 14, 14)
    sd[vp + "embeddings.patch_embedding.bias"] = t(H)
    sd[vp + "embeddings.class_embedding"] = t(1, 1, H)
    n_pos = cfg.vit.num_patches + 1
    sd[vp + "embeddings.position_embedding"] = t(1, n_pos, H)
    for i in range(cfg.vit.num_layers):
        lp = vp + f"encoder.layers.{i}."
        sd[lp + "attn.qkv.weight"] = t(3 * H, H)
        sd[lp + "attn.qkv.bias"] = t(3 * H)
        sd[lp + "attn.proj.weight"] = t(H, H)
        sd[lp + "attn.proj.bias"] = t(H)
        sd[lp + "norm1.weight"] = t(H); sd[lp + "norm1.bias"] = t(H)
        sd[lp + "norm2.weight"] = t(H); sd[lp + "norm2.bias"] = t(H)
        sd[lp + "ls1"] = t(H); sd[lp + "ls2"] = t(H)
        sd[lp + "mlp.fc1.weight"] = t(cfg.vit.intermediate_size, H)
        sd[lp + "mlp.fc1.bias"] = t(cfg.vit.intermediate_size)
        sd[lp + "mlp.fc2.weight"] = t(H, cfg.vit.intermediate_size)
        sd[lp + "mlp.fc2.bias"] = t(H)
    proj_in = int(H / cfg.vit.downsample_ratio ** 2)
    mp = prefix + "mlp1."
    sd[mp + "0.weight"] = t(proj_in); sd[mp + "0.bias"] = t(proj_in)
    sd[mp + "1.weight"] = t(cfg.vit.projector_out, proj_in)
    sd[mp + "1.bias"] = t(cfg.vit.projector_out)
    sd[mp + "3.weight"] = t(cfg.vit.projector_out, cfg.vit.projector_out)
    sd[mp + "3.bias"] = t(cfg.vit.projector_out)
    return sd


def _make_llm_state_dict(cfg, prefix="language_model.model."):
    t = torch.randn
    c = cfg.llm
    H, D = c.hidden_size, c.head_dim
    sd = {prefix + "embed_tokens.weight": t(c.vocab_size, H),
          prefix + "norm.weight": t(H)}
    for i in range(c.num_layers):
        lp = prefix + f"layers.{i}."
        sd[lp + "input_layernorm.weight"] = t(H)
        sd[lp + "post_attention_layernorm.weight"] = t(H)
        sd[lp + "self_attn.q_proj.weight"] = t(c.num_heads * D, H)
        sd[lp + "self_attn.q_proj.bias"] = t(c.num_heads * D)
        sd[lp + "self_attn.k_proj.weight"] = t(c.num_kv_heads * D, H)
        sd[lp + "self_attn.k_proj.bias"] = t(c.num_kv_heads * D)
        sd[lp + "self_attn.v_proj.weight"] = t(c.num_kv_heads * D, H)
        sd[lp + "self_attn.v_proj.bias"] = t(c.num_kv_heads * D)
        sd[lp + "self_attn.o_proj.weight"] = t(H, c.num_heads * D)
        sd[lp + "mlp.gate_proj.weight"] = t(c.intermediate_size, H)
        sd[lp + "mlp.up_proj.weight"] = t(c.intermediate_size, H)
        sd[lp + "mlp.down_proj.weight"] = t(H, c.intermediate_size)
    return sd


def test_load_raw_internvl2_checkpoint(tmp_path):
    cfg = _tiny_cfg()
    sd = {**_make_remote_code_state_dict(cfg),
          **_make_llm_state_dict(cfg)}
    path = tmp_path / "pytorch_model.pt"
    torch.save(sd, str(path))

    params = ckpt.load_hf_checkpoint(str(path), cfg)
    assert params["llm"]["embed"]["w"].shape == (128, 48)
    assert params["vision"]["layers"]["0"]["attn"]["q"]["w"].shape == (32, 32)

    # forward runs end to end on the converted tree
    from simlingo_tpu.data.synthetic import synthetic_example
    from simlingo_tpu.models import simlingo
    params = jax.tree_util.tree_map(jnp.asarray, params)
    params["adaptors"] = simlingo.init_params(
        jax.random.PRNGKey(0), cfg)["adaptors"]
    params["wp_encoder"] = simlingo.init_params(
        jax.random.PRNGKey(0), cfg)["wp_encoder"]
    ex = synthetic_example(cfg, batch=1, seq_len=64, num_patches=1)
    out, _ = simlingo.forward_loss(params, ex, cfg)
    assert np.isfinite(float(out.loss))


def _make_trained_sd(cfg, lora_b_zero=True, lora_r=2):
    """DrivingModel layout: vision_model.model.* + peft-wrapped LLM
    (base_layer + lora_A/B on q_proj) + adaptors + wp_encoder."""
    t = torch.randn
    sd = {}
    sd.update(_make_remote_code_state_dict(cfg, prefix="vision_model.model."))
    llm = _make_llm_state_dict(
        cfg, prefix="language_model.model.base_model.model.model.")
    peft_sd = {}
    for k, v in llm.items():
        if "self_attn.q_proj.weight" in k:
            mod = k[: -len(".weight")]
            peft_sd[mod + ".base_layer.weight"] = v
            peft_sd[mod + ".lora_A.default.weight"] = t(
                lora_r, cfg.llm.hidden_size)
            b = torch.zeros(cfg.llm.num_heads * cfg.llm.head_dim, lora_r)
            peft_sd[mod + ".lora_B.default.weight"] = b if lora_b_zero \
                else t(cfg.llm.num_heads * cfg.llm.head_dim, lora_r)
        else:
            peft_sd[k] = v
    sd.update(peft_sd)
    H = cfg.llm.hidden_size
    sd["adaptors.driving.query_embeds_wps"] = t(1, 20, H)
    sd["adaptors.driving.query_embeds_speed"] = t(1, 10, H)
    for i, (din, dout) in enumerate([(H, 512), (512, 256), (256, 2)]):
        sd[f"adaptors.driving.route_head.{i*2}.weight"] = t(dout, din)
        if i < 2:
            sd[f"adaptors.driving.route_head.{i*2}.bias"] = t(dout)
    for i, (din, dout) in enumerate([(H, 256), (256, 2)]):
        sd[f"adaptors.driving.speed_wps_head.{i*2}.weight"] = t(dout, din)
        if i < 1:
            sd[f"adaptors.driving.speed_wps_head.{i*2}.bias"] = t(dout)
    for i, (din, dout) in enumerate([(2, 256), (256, 512), (512, H)]):
        sd[f"wp_encoder.mlp.{i*2}.weight"] = t(dout, din)
        sd[f"wp_encoder.mlp.{i*2}.bias"] = t(dout)
    return sd, llm


def test_trained_simlingo_layout_with_lora_merge(tmp_path):
    cfg = _tiny_cfg()
    sd, llm = _make_trained_sd(cfg, lora_b_zero=True)
    H = cfg.llm.hidden_size

    path = tmp_path / "pytorch_model.pt"
    torch.save(sd, str(path))

    params = ckpt.load_hf_checkpoint(str(path), cfg, lora_merge=True,
                                     lora_alpha=4, lora_r=2)
    # with B zero-init, merged == base
    base = llm["language_model.model.base_model.model.model."
               "layers.0.self_attn.q_proj.weight"]
    np.testing.assert_allclose(
        np.asarray(params["llm"]["layers"]["0"]["attn"]["q"]["w"]),
        base.numpy().T, atol=1e-6)
    assert params["adaptors"]["route_queries"].shape == (1, 20, H)
    assert "l0" in params["wp_encoder"]


def test_full_1b_shapes_convert_and_forward(tmp_path):
    """Full InternVL2-1B geometry (VERDICT round-1 item 10): exact remote-code
    names at production shapes -- fused ViT qkv [3072, 1024], mlp1
    projector 4096->896, Qwen2-0.5B with the 151674-token vocab -- through
    the converter, then one end-to-end forward.

    Reference: OpenGVLab/InternVL2-1B remote code + RenzKa/simlingo layout;
    token table per simlingo_training/dataloader/datamodule.py:130-136.
    """
    from simlingo_tpu.core import presets
    cfg = presets.internvl2_1b(lora=False)

    def t(*shape):
        # fp16 keeps the on-disk/dict footprint ~2 GB for the 1B tree
        return torch.randn(*shape, dtype=torch.float16) * 0.02

    sd = {}
    vp = "vision_model."
    H = cfg.vit.hidden_size
    sd[vp + "embeddings.patch_embedding.weight"] = t(H, 3, 14, 14)
    sd[vp + "embeddings.patch_embedding.bias"] = t(H)
    sd[vp + "embeddings.class_embedding"] = t(1, 1, H)
    sd[vp + "embeddings.position_embedding"] = t(1, cfg.vit.num_patches + 1, H)
    for i in range(cfg.vit.num_layers):
        lp = vp + f"encoder.layers.{i}."
        sd[lp + "attn.qkv.weight"] = t(3 * H, H)
        sd[lp + "attn.qkv.bias"] = t(3 * H)
        sd[lp + "attn.proj.weight"] = t(H, H)
        sd[lp + "attn.proj.bias"] = t(H)
        sd[lp + "norm1.weight"] = t(H); sd[lp + "norm1.bias"] = t(H)
        sd[lp + "norm2.weight"] = t(H); sd[lp + "norm2.bias"] = t(H)
        sd[lp + "ls1"] = t(H); sd[lp + "ls2"] = t(H)
        sd[lp + "mlp.fc1.weight"] = t(cfg.vit.intermediate_size, H)
        sd[lp + "mlp.fc1.bias"] = t(cfg.vit.intermediate_size)
        sd[lp + "mlp.fc2.weight"] = t(H, cfg.vit.intermediate_size)
        sd[lp + "mlp.fc2.bias"] = t(H)
    proj_in = int(H / cfg.vit.downsample_ratio ** 2)       # 4096
    assert proj_in == 4096
    sd["mlp1.0.weight"] = t(proj_in); sd["mlp1.0.bias"] = t(proj_in)
    sd["mlp1.1.weight"] = t(cfg.vit.projector_out, proj_in)
    sd["mlp1.1.bias"] = t(cfg.vit.projector_out)
    sd["mlp1.3.weight"] = t(cfg.vit.projector_out, cfg.vit.projector_out)
    sd["mlp1.3.bias"] = t(cfg.vit.projector_out)
    sd.update(_make_llm_state_dict(cfg))
    assert sd["language_model.model.embed_tokens.weight"].shape == (151674, 896)

    path = tmp_path / "pytorch_model.pt"
    torch.save(sd, str(path))
    params = ckpt.load_hf_checkpoint(str(path), cfg)

    # exact production shapes land in the tree
    assert params["vision"]["layers"]["0"]["attn"]["q"]["w"].shape == (1024, 1024)
    assert params["vision"]["projector"]["fc1"]["w"].shape == (4096, 896)
    assert params["llm"]["embed"]["w"].shape == (151674, 896)
    assert params["llm"]["layers"]["23"]["mlp"]["down"]["w"].shape == (4864, 896)

    # fused-qkv split is positional: q rows 0:H, k rows H:2H, v rows 2H:3H
    qkv = sd[vp + "encoder.layers.0.attn.qkv.weight"].float().numpy()
    np.testing.assert_allclose(
        np.asarray(params["vision"]["layers"]["0"]["attn"]["k"]["w"]),
        qkv[H:2 * H].T, atol=1e-6)

    # token table vs the reference datamodule (datamodule.py:130-136)
    from simlingo_tpu.data.tokenizer import PLACEHOLDER_TOKENS
    assert PLACEHOLDER_TOKENS == (
        "<WAYPOINTS>", "<WAYPOINTS_DIFF>", "<ORG_WAYPOINTS_DIFF>",
        "<ORG_WAYPOINTS>", "<WAYPOINT_LAST>", "<ROUTE>",
        "<ROUTE_DIFF>", "<TARGET_POINT>")
    assert cfg.img_context_token_id == 151648  # <IMG_CONTEXT> in InternVL2-1B

    # end-to-end forward at full shapes
    from simlingo_tpu.data.synthetic import synthetic_example
    from simlingo_tpu.models import simlingo
    params = jax.tree_util.tree_map(jnp.asarray, params)
    init = simlingo.init_params(jax.random.PRNGKey(0), cfg)
    params["adaptors"] = init["adaptors"]
    params["wp_encoder"] = init["wp_encoder"]
    del init
    ex = synthetic_example(cfg, batch=1, seq_len=600, num_patches=1)
    out, _ = simlingo.forward_loss(params, ex, cfg,
                                   compute_dtype=jnp.bfloat16)
    assert np.isfinite(float(out.loss))


def test_unmerged_lora_conversion_matches_merged(tmp_path):
    """VERDICT r2 #7: LoRA-carried (unmerged) conversion. lora_merge=False
    returns the adapters in the qwen2 layout; running them LIVE gives the
    same logits as the merged conversion."""
    import dataclasses

    from simlingo_tpu.models import qwen2

    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, llm=dataclasses.replace(cfg.llm, lora_r=2, lora_alpha=4))
    sd, _ = _make_trained_sd(cfg, lora_b_zero=False)   # nonzero B: real delta
    path = tmp_path / "pytorch_model.pt"
    torch.save(sd, str(path))

    merged = ckpt.load_hf_checkpoint(str(path), cfg, lora_merge=True,
                                     lora_alpha=4, lora_r=2)
    carried = ckpt.load_hf_checkpoint(str(path), cfg, lora_merge=False)
    assert "lora" in carried
    lt = carried["lora"]["layers"]
    assert set(lt.keys()) == {"0", "1"} and set(lt["0"]) == {"q"}
    assert lt["0"]["q"]["a"].shape == (cfg.llm.hidden_size, 2)
    assert lt["0"]["q"]["b"].shape == (2, cfg.llm.num_heads * cfg.llm.head_dim)
    # unmerged base == raw base (no delta folded in)
    assert not np.allclose(merged["llm"]["layers"]["0"]["attn"]["q"]["w"],
                           carried["llm"]["layers"]["0"]["attn"]["q"]["w"])

    x = jnp.asarray(np.random.RandomState(0).randn(1, 5, cfg.llm.hidden_size),
                    jnp.float32)
    pos = jnp.arange(5)[None]
    merged_p = jax.tree_util.tree_map(jnp.asarray, merged["llm"])
    carried_p = jax.tree_util.tree_map(jnp.asarray, carried["llm"])
    lora_p = jax.tree_util.tree_map(jnp.asarray, carried["lora"])
    h_merged, _ = qwen2.forward(merged_p, x, cfg.llm, pos)
    h_live, _ = qwen2.forward(carried_p, x, cfg.llm, pos, lora_params=lora_p)
    np.testing.assert_allclose(np.asarray(h_merged), np.asarray(h_live),
                               atol=1e-4)


def test_parity_harness_roundtrip(tmp_path):
    """VERDICT r2 #7: the one-command checkpoint parity harness runs the
    full agent path against a synthesized snapshot dir, its trace
    roundtrips (save -> diff == no errors), and tampering is detected."""
    import copy
    import importlib.util
    import json
    import os

    spec = importlib.util.spec_from_file_location(
        "checkpoint_parity",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "checkpoint_parity.py"))
    cp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cp)

    cfg = _tiny_cfg()
    sd, _ = _make_trained_sd(cfg, lora_b_zero=True)
    snap = tmp_path / "snapshot"
    snap.mkdir()
    torch.save(sd, str(snap / "pytorch_model.pt"))

    got = cp.run_one_frame(str(snap), keep_lora=False, max_new_tokens=6,
                           cfg=cfg, max_prompt_len=128)
    assert got["tokenizer"] == "fallback"          # no tokenizer files
    assert len(got["language_tokens"]) <= 6
    assert np.asarray(got["route"]).shape == (20, 2)

    # roundtrip through json (what --save-trace / --trace do)
    ref = json.loads(json.dumps(got))
    assert cp.diff_traces(got, ref, atol=1e-3) == []

    # determinism: a second identical run reproduces the trace
    again = cp.run_one_frame(str(snap), keep_lora=False, max_new_tokens=6,
                             cfg=cfg, max_prompt_len=128)
    assert cp.diff_traces(again, ref, atol=1e-3) == []

    # tampering is caught
    bad = copy.deepcopy(ref)
    bad["language_tokens"] = list(bad["language_tokens"]) + [1]
    bad["route"][0][0] += 1.0
    errs = cp.diff_traces(got, bad, atol=1e-3)
    assert any("tokens" in e for e in errs)
    assert any("route" in e for e in errs)
