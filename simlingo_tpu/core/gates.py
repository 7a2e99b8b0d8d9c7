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
    "SIMLINGO_CE_IMPL": "xla",       # pallas CE measured SLOWER in-context
                                     # (16.82 vs 17.01 on top of V2, r5)
    "SIMLINGO_DROPOUT_V2": "1",      # native-rank hardware-PRNG dropout:
                                     # 17.01 vs 15.32 samples/s (r5 matrix);
                                     # needs the 24 MiB scoped-VMEM limit
                                     # (train.py/bench.py default)
    "SIMLINGO_LN_IMPL": "xla",       # pallas LN: no in-context win (r5 all-
                                     # levers cell 15.25) + flaky compile
    "SIMLINGO_LORA_FUSED": "0",      # +4% alone but subsumed by V2 (16.97
                                     # vs 17.01) and changes group dropout
                                     # mask semantics -- keep off
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
