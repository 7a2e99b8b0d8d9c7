#!/usr/bin/env python
"""Training entry point.

Counterpart of reference `simlingo_training/train.py` (Hydra main):

    python train.py --experiment configs/simlingo.yaml \\
        data.data_root=/path/to/database max_epochs=15 mesh.fsdp=2

Any dotted `key=value` pair overrides the composed TrainConfig. Use
`--synthetic` to run without a dataset on disk (benchmark/smoke mode).
"""

import argparse


def main():
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
