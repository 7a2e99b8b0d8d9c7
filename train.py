#!/usr/bin/env python
"""Training entry point.

Counterpart of reference `simlingo_training/train.py` (Hydra main):

    python train.py --experiment configs/simlingo.yaml \\
        data.data_root=/path/to/database max_epochs=15 mesh.fsdp=2

Any dotted `key=value` pair overrides the composed TrainConfig. Use
`--synthetic` to run without a dataset on disk (benchmark/smoke mode).
"""

import argparse
import os


def _raise_scoped_vmem():
    """Raise XLA's scoped-VMEM limit (default 16 MiB) before jax is
    imported: the bwd-attention single-kv-block path allocates right at
    the default limit, and the dropout-v2 layouts push it to 20.07 MiB
    (see bench.py + kernels/flash_attention.py, which reads the flag and
    scales its block heuristics). SIMLINGO_SCOPED_VMEM_KIB=0 keeps the
    XLA default."""
    # 24 MiB since r5: the dropout-v2 production default needs it
    # (see bench.py:_raise_scoped_vmem and docs/BENCH_NOTES.md round 5)
    kib = int(os.environ.get("SIMLINGO_SCOPED_VMEM_KIB", "24576"))
    # LIBTPU_INIT_ARGS, not XLA_FLAGS: the CPU jaxlib flag parser fatals
    # on unknown --xla_tpu_* flags (see bench.py:_raise_scoped_vmem)
    flags = os.environ.get("LIBTPU_INIT_ARGS", "")
    if kib and "scoped_vmem_limit" not in flags:
        os.environ["LIBTPU_INIT_ARGS"] = (
            flags + f" --xla_tpu_scoped_vmem_limit_kib={kib}").strip()


def main():
    _raise_scoped_vmem()
    ap = argparse.ArgumentParser()
    ap.add_argument("--experiment", default=None,
                    help="configs/<name>.yaml overlay")
    ap.add_argument("--synthetic", action="store_true",
                    help="train on synthetic batches (no dataset needed)")
    ap.add_argument("overrides", nargs="*", help="dotted key=value overrides")
    args = ap.parse_args()

    from simlingo_tpu.core.config import compose
    from simlingo_tpu.train import trainer

    cfg = compose(args.experiment, args.overrides)
    trainer.train(cfg, make_synthetic=args.synthetic)


if __name__ == "__main__":
    main()
