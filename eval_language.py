#!/usr/bin/env python
"""Language/dreamer evaluation entry point.

Counterpart of reference `simlingo_training/eval.py` + `eval_metrics.py`:

    python eval_language.py --checkpoint outputs/run/checkpoints/step_x \\
        --mode QA --data-root database/simlingo
"""

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True,
                    help="orbax checkpoint dir or torch/HF checkpoint")
    ap.add_argument("--mode", default="QA",
                    choices=["QA", "commentary", "Dreaming"])
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--eval-set", default=None,
                    help="json list of sample indices (default: all)")
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--output-dir", default="predictions")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--num-samples", type=int, default=0)
    args = ap.parse_args()

    import jax
    import numpy as np

    from simlingo_tpu.core import checkpoint as ckpt
    from simlingo_tpu.core.presets import internvl2_1b
    import os
    from simlingo_tpu.data.dreamer_dataset import (DreamerDataset,
                                                   DreamerDatasetConfig)
    from simlingo_tpu.data.driving_dataset import (DrivingDataset,
                                                   DrivingDatasetConfig)
    from simlingo_tpu.data.tokenizer import SimLingoTokenizer
    from simlingo_tpu.eval.language_eval import EvalConfig, run_language_eval
    from simlingo_tpu.models import simlingo

    # rebuild the model config from the training run when available
    # (reference eval.py:73-77 reloads .hydra/config.yaml from the ckpt dir)
    model_cfg = internvl2_1b()
    run_dir = os.path.dirname(os.path.dirname(os.path.abspath(args.checkpoint)))
    run_cfg_path = os.path.join(run_dir, "config.json")
    if os.path.isfile(run_cfg_path):
        import dataclasses
        import json as _json
        with open(run_cfg_path) as f:
            run_cfg = _json.load(f)
        m = run_cfg.get("model", {})
        if m.get("speed_wps_mode"):
            model_cfg = dataclasses.replace(
                model_cfg, speed_wps_mode=m["speed_wps_mode"],
                predict_route_as_wps=m.get("predict_route_as_wps", True))
    if any(args.checkpoint.endswith(s) for s in (".pt", ".bin")) \
            or "step_" not in args.checkpoint:
        params = ckpt.load_hf_checkpoint(args.checkpoint, model_cfg)
        params = jax.tree_util.tree_map(jax.numpy.asarray, params)
    else:
        import jax.numpy as jnp
        target = simlingo.init_params(jax.random.PRNGKey(0), model_cfg)
        params = ckpt.restore_checkpoint(args.checkpoint,
                                         {"params": target})["params"]

    dcfg_kwargs = dict(
        data_root=args.data_root, split="val",
        use_commentary=args.mode == "commentary",
        use_qa=args.mode == "QA",
        commentary_augmentation=False, qa_augmentation=False,
        img_shift_augmentation=False)
    if args.mode == "Dreaming":
        dataset = DreamerDataset(DreamerDatasetConfig(
            **dcfg_kwargs, use_safety_flag=True))
    else:
        dataset = DrivingDataset(DrivingDatasetConfig(**dcfg_kwargs))

    if args.eval_set:
        with open(args.eval_set) as f:
            samples = json.load(f)
    else:
        samples = list(range(len(dataset)))
    if args.num_samples:
        samples = samples[: args.num_samples]

    tok = SimLingoTokenizer(args.tokenizer)
    results = run_language_eval(
        params, model_cfg, samples, dataset, tok,
        EvalConfig(mode=args.mode, batch_size=args.batch_size,
                   output_dir=args.output_dir))
    print(json.dumps(results.get("metrics", {}), indent=2))
    if "dreamer" in results:
        print(json.dumps(results["dreamer"], indent=2))


if __name__ == "__main__":
    main()
