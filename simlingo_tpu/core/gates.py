"""Canonical readers for the kernel-lever env gates (SIMLINGO_*).

Every gate has exactly one production default, defined HERE and nowhere
else. Call sites (kernels, train_step, bench.py's self-describing
`levers` artifact field) all resolve through these functions, so flipping
a chip-measured winner to the production default is a one-line change
that every consumer — including the recorded bench line — agrees on.

Gates are read at TRACE time (inside jit-ed function construction), so a
change requires rebuilding the step function; that is the existing
contract of every SIMLINGO_* flag (docs/BENCH_NOTES.md).
"""

import os

# Production defaults (chip-measured winners only; see docs/BENCH_NOTES.md
# round-5 measurement table for the numbers behind each choice).
_DEFAULTS = {
    "SIMLINGO_ATTN_IMPL": "auto",    # per-backend pick; entries force pallas
    "SIMLINGO_CE_IMPL": "xla",       # fused Pallas CE: frozen-embed only
    "SIMLINGO_DROPOUT_V2": "0",      # native-rank hardware-PRNG dropout
    "SIMLINGO_LN_IMPL": "xla",       # fused Pallas LayerNorm/RMSNorm
    "SIMLINGO_LORA_FUSED": "0",      # grouped q/k/v + gate/up LoRA matmuls
}


def _get(name: str) -> str:
    return os.environ.get(name, _DEFAULTS[name])


def attn_impl() -> str:
    return _get("SIMLINGO_ATTN_IMPL")


def ce_impl() -> str:
    return _get("SIMLINGO_CE_IMPL")


def dropout_v2() -> bool:
    return _get("SIMLINGO_DROPOUT_V2") == "1"


def ln_impl() -> str:
    return _get("SIMLINGO_LN_IMPL")


def lora_fused() -> bool:
    return _get("SIMLINGO_LORA_FUSED") == "1"


def resolved() -> dict:
    """The full gate state as it would apply to a step built right now."""
    return {name.replace("SIMLINGO_", "").lower(): _get(name)
            for name in _DEFAULTS}
