"""From-scratch LLaMA backbone for SimLingo-Base (CarLLaVA).

Behavioral counterpart of reference
`simlingo_base_training/models/language_model/llama.py`: a size table of
from-scratch LlamaModel configs (the production base model uses `tiny`,
~50M params, config/experiment/simlingo_base_1.yaml:20-23) operating on
*continuous token embeddings only* (vocabulary removed -- the base model has
no language IO; reference llama.py:80-130).

Implementation: LLaMA is architecturally a Qwen2 without qkv biases, so the
decoder stack is shared (models/qwen2.py) with qkv_bias=False and
rope_theta=1e4. A 1-row embedding table stands in for the removed vocabulary
(never used; keeps the param tree uniform).
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from simlingo_tpu.models.qwen2 import Qwen2Config

# Reference CONFIGS (llama.py:14-46), num_key_value_heads defaults to heads.
CONFIGS: Dict[str, Dict[str, int]] = {
    "debug": dict(num_layers=2, num_heads=2, hidden_size=32,
                  intermediate_size=64),
    "tiny": dict(num_layers=12, num_heads=8, hidden_size=512,
                 intermediate_size=2048),        # ~50M
    "x-small": dict(num_layers=14, num_heads=8, hidden_size=1024,
                    intermediate_size=4096),     # ~235M
    "small": dict(num_layers=22, num_heads=8, hidden_size=1024,
                  intermediate_size=4096),       # ~369M
    "medium": dict(num_layers=22, num_heads=12, hidden_size=1536,
                   intermediate_size=4096),      # ~623M
    "large": dict(num_layers=22, num_heads=16, hidden_size=2048,
                  intermediate_size=5632),       # ~1.1B
}


def llama_config(variant: str, num_kv_heads: int = 0) -> Qwen2Config:
    c = CONFIGS[variant]
    heads = c["num_heads"]
    return Qwen2Config(
        vocab_size=1,                       # vocabulary removed
        hidden_size=c["hidden_size"],
        num_layers=c["num_layers"],
        num_heads=heads,
        num_kv_heads=num_kv_heads or heads,
        head_dim=c["hidden_size"] // heads,
        intermediate_size=c["intermediate_size"],
        rope_theta=1e4,
        tie_word_embeddings=True,
        qkv_bias=False,
    )
