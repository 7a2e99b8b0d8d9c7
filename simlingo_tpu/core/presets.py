"""Model-size presets.

`internvl2_1b` mirrors the reference production model (simlingo_seed1.yaml:
OpenGVLab/InternVL2-1B = InternViT-300M-448px + Qwen2-0.5B, LoRA r=32 a=64
dropout 0.1 on all-linear). Exact vocab size is read from a checkpoint at
conversion time; the default here matches the InternVL2-1B embedding table.

The reference clamps its 8 added placeholder-token ids into the embedding
range (adaptors.py:256) because their content is overwritten by placeholder
splicing -- our embed() clips identically, so no vocab resize is needed.
"""

from __future__ import annotations

from simlingo_tpu.models.qwen2 import Qwen2Config
from simlingo_tpu.models.simlingo import SimLingoConfig
from simlingo_tpu.models.vit import ViTConfig


def internvl2_1b(lora: bool = True, vocab_size: int = 151674) -> SimLingoConfig:
    return SimLingoConfig(
        # InternViT-300M-448px; tanh-GELU in bf16 is below rounding noise
        # of the exact form and ~16% faster fwd+bwd (ViTConfig docstring)
        vit=ViTConfig(gelu_approximate=True),
        llm=Qwen2Config(
            vocab_size=vocab_size,
            lora_r=32 if lora else 0,
            lora_alpha=64 if lora else 0,
            lora_dropout=0.1 if lora else 0.0,
        ),
        img_context_token_id=151648,
        speed_wps_mode="2d",
        predict_route_as_wps=True,
    )


def production_shaped(num_layers: int = 2,
                      image_size: int = 224) -> SimLingoConfig:
    """Production WIDTHS (every sharded dimension at its real InternVL2-1B
    size: ViT hidden 1024/mlp 4096/16 heads, Qwen2 hidden 896/mlp
    4864/14q+2kv heads, vocab 151674, LoRA r=32) with reduced DEPTH and a
    smaller ViT raster (sequence length is never sharded) so the
    virtual-CPU-mesh dry run finishes quickly. Validates that the partition
    rules divide the real dimensions and that the full train step compiles
    and executes under dp/fsdp/tp sharding at production shapes."""
    full = internvl2_1b(lora=True)
    import dataclasses
    return dataclasses.replace(
        full,
        vit=dataclasses.replace(full.vit, num_layers=num_layers,
                                image_size=image_size),
        llm=dataclasses.replace(full.llm, num_layers=num_layers),
        remat_vision=False, remat_llm=False)


def small_shardable() -> SimLingoConfig:
    """Small config whose dims divide a (dp, fsdp=2, tp=2) mesh -- used by
    multi-chip dry runs and sharding tests."""
    return SimLingoConfig(
        vit=ViTConfig(hidden_size=128, num_layers=2, num_heads=4,
                      intermediate_size=256, image_size=56, patch_size=14,
                      projector_out=256),
        llm=Qwen2Config(vocab_size=2048, hidden_size=256, num_layers=2,
                        num_heads=8, num_kv_heads=2, head_dim=32,
                        intermediate_size=512),
        img_context_token_id=1000,
        remat_vision=False, remat_llm=False)
