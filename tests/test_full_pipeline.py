"""Full-pipeline integration: on-disk dataset -> label generation ->
trainer (real bucket sampler + collate + prefetch) -> checkpoint -> resume ->
language/dreamer evaluation. Everything tiny, on the CPU backend."""

import dataclasses
import json
import os

import numpy as np
import pytest

from tests.test_data_pipeline import _write_route


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    rd = _write_route(root, "v1/b0/routes_training/Town12_e2e", n_frames=35)
    from simlingo_tpu.labels import commentary, dreamer_gen, vqa
    commentary.generate_route_commentary(rd)
    vqa.generate_route_vqa(rd)
    dreamer_gen.generate_route_dreamer(rd)
    # a held-out route for the trainer's validation loop (split="val")
    vd = _write_route(root, "v1/b0/routes_validation/Town12_val", n_frames=28)
    commentary.generate_route_commentary(vd)
    vqa.generate_route_vqa(vd)
    return root, rd


def _tiny_train_cfg(root, out_dir):
    from simlingo_tpu.core.config import compose
    from simlingo_tpu.data.tokenizer import SimLingoTokenizer
    from simlingo_tpu.models.qwen2 import Qwen2Config
    from simlingo_tpu.models.simlingo import SimLingoConfig
    from simlingo_tpu.models.vit import ViTConfig

    tok = SimLingoTokenizer()
    cfg = compose(overrides=[
        "max_steps=4", "name=e2e", "log_every_n_steps=1",
        "val_max_batches=2",
        "checkpoint_every_n_steps=2", "keep_checkpoints=2",
        "precision=f32",
    ])
    object.__setattr__(cfg, "model", SimLingoConfig(
        vit=ViTConfig(hidden_size=32, num_layers=1, num_heads=2,
                      intermediate_size=64, image_size=56, patch_size=14,
                      projector_out=32),
        llm=Qwen2Config(vocab_size=tok.tk.vocab_size + 8, hidden_size=32,
                        num_layers=1, num_heads=2, num_kv_heads=1,
                        head_dim=16, intermediate_size=64),
        img_context_token_id=tok.img_context_id,
        remat_vision=False, remat_llm=False, max_answer_len=64))
    object.__setattr__(cfg, "output_dir", out_dir)
    object.__setattr__(cfg.data, "data_root", root)
    object.__setattr__(cfg.data, "batch_size", 2)
    object.__setattr__(cfg.data, "num_workers", 2)
    object.__setattr__(cfg.data, "max_text_len", 768)
    object.__setattr__(cfg.data, "use_dreamer", True)
    base = dataclasses.replace(
        cfg.data.base, data_root=root, use_town13=False,
        route_as="target_point", image_size=56, max_num_grid=2,
        use_commentary=True, use_qa=True, commentary_augmentation=False,
        qa_augmentation=False, img_shift_augmentation=False)
    object.__setattr__(cfg.data, "base", base)
    return cfg, tok


def test_train_checkpoint_resume_eval(workspace, tmp_path):
    import jax
    from simlingo_tpu.train import trainer

    root, rd = workspace
    out_dir = str(tmp_path / "runs")
    cfg, tok = _tiny_train_cfg(root, out_dir)

    result = trainer.train(cfg)
    assert np.isfinite(result["metrics"]["loss"])
    # the validation loop ran on the held-out routes_validation split
    # (final-step validation; reference validation_step parity)
    assert np.isfinite(result["metrics"]["val_loss"])
    run_dir = os.path.join(out_dir, "e2e")
    assert os.path.isfile(os.path.join(run_dir, "config.json"))
    assert os.path.isfile(os.path.join(run_dir, "metrics.jsonl"))
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        logged = [json.loads(l) for l in f]
    assert any("val_loss" in m for m in logged)
    ckpts = os.listdir(os.path.join(run_dir, "checkpoints"))
    assert any(c.startswith("step_") for c in ckpts)

    # resume: continues from step 4 (no new steps -> exits, saves final)
    object.__setattr__(cfg, "resume", True)
    object.__setattr__(cfg, "max_steps", 6)
    result2 = trainer.train(cfg)
    assert result2["total_steps"] == 6

    # evaluation (Dreaming mode) on the trained params
    from simlingo_tpu.data.dreamer_dataset import (DreamerDataset,
                                                   DreamerDatasetConfig)
    from simlingo_tpu.eval.language_eval import EvalConfig, run_language_eval
    import jax.numpy as jnp

    ds = DreamerDataset(DreamerDatasetConfig(
        data_root=root, split="train", use_town13=False,
        route_as="target_point", image_size=56, max_num_grid=2,
        use_commentary=False, use_qa=False))
    params = result2["state"]["params"]
    res = run_language_eval(
        params, cfg.model, list(range(4)), ds, tok,
        EvalConfig(mode="Dreaming", batch_size=2, max_new_tokens=4,
                   output_dir=str(tmp_path / "preds"), max_text_len=768),
        compute_dtype=jnp.float32)
    assert "dreamer" in res
    assert res["dreamer"]["num_samples"] > 0
    assert os.path.isfile(str(tmp_path / "preds" / "dreamer_results.json"))
    assert os.path.isfile(str(tmp_path / "preds" / "language_preds_all.json"))
