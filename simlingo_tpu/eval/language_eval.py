"""Offline language evaluation runner.

Counterpart of reference `simlingo_training/eval.py` +
`DrivingModel.predict_step/on_predict_epoch_end` (driving.py:285-705):
three modes (QA / commentary / Dreaming); batched generation over an eval
set; writes `language_preds_{cot,qa,all}.json`, `sorted_qa_templates.json`
and (Dreaming) `dreamer_results.json` with per-mode success rates.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from simlingo_tpu.data.collate import CollateConfig, collate
from simlingo_tpu.data.tokenizer import SimLingoTokenizer
from simlingo_tpu.eval import dreamer_rules, metrics
from simlingo_tpu.models.simlingo import SimLingoConfig


@dataclasses.dataclass
class EvalConfig:
    mode: str = "QA"                 # QA | commentary | Dreaming
    batch_size: int = 8
    max_new_tokens: int = 100
    output_dir: str = "predictions"
    max_text_len: int = 768


def load_eval_set(path: str) -> List[Dict]:
    """evalset json: list of {route, frame} sample descriptors
    (reference data/evalset_vqa.json, selected in dataset_base.py:86-114)."""
    with open(path) as f:
        return json.load(f)


def run_language_eval(params, model_cfg: SimLingoConfig, samples: Sequence,
                      dataset, tok: SimLingoTokenizer, cfg: EvalConfig,
                      compute_dtype=None) -> Dict[str, Any]:
    """samples: list of dataset indices; dataset yields RawSamples with
    eval metadata. Returns + writes prediction/results JSONs."""
    import jax
    import jax.numpy as jnp
    from simlingo_tpu.infer import runner

    compute_dtype = compute_dtype or jnp.bfloat16
    ccfg = CollateConfig(max_text_len=cfg.max_text_len,
                         pad_side_infer="left")
    gen_cfg = runner.GenerateConfig(max_new_tokens=cfg.max_new_tokens,
                                    eos_token_id=tok.eos_token_id)
    gen = jax.jit(lambda p, d: runner.generate_and_drive(
        p, d, model_cfg, gen_cfg, compute_dtype=compute_dtype))

    preds: Dict[str, List] = {
        "language": [], "language_gt": [], "prompt": [], "path": [],
        "route": [], "speed_wps": [], "route_gt": [], "waypoints_gt": [],
        "qa_templates": [], "eval_infos": [],
    }
    rng = np.random.RandomState(0)
    B = cfg.batch_size

    def fetch(entry):
        if isinstance(entry, tuple):
            j, template = entry
            try:
                return dataset.get(j, rng, force_qa=template)
            except TypeError:
                return dataset.get(j, rng)
        return dataset.get(entry, rng)

    for i in range(0, len(samples), B):
        chunk = [fetch(e) for e in samples[i:i + B]]
        pad_to = B - len(chunk)
        raw = chunk + [chunk[-1]] * pad_to     # static batch shape
        ex = collate(raw, tok, ccfg, for_inference=True)
        out = gen(params, ex.driving_input)
        for b, s in enumerate(chunk):
            n = int(out.language_lengths[b])
            text = tok.decode(np.asarray(out.language_tokens[b][:n]))
            preds["language"].append(text)
            preds["language_gt"].append(s.answer)
            preds["prompt"].append(s.question)
            preds["path"].append(s.measurement_path)
            preds["route"].append(np.asarray(out.route[b]).tolist())
            preds["speed_wps"].append(np.asarray(out.speed_wps[b]).tolist())
            preds["route_gt"].append(np.asarray(s.path).tolist())
            preds["waypoints_gt"].append(np.asarray(s.waypoints).tolist())
            preds["qa_templates"].append(s.qa_template)
            preds["eval_infos"].append(s.eval_infos)

    os.makedirs(cfg.output_dir, exist_ok=True)
    results: Dict[str, Any] = {}

    # ---- language predictions, grouped like the reference (driving.py:355+)
    idx_cot = [i for i, p in enumerate(preds["prompt"])
               if "What should the ego do next?" in p]
    idx_qa = [i for i, p in enumerate(preds["prompt"]) if "Q:" in p]
    groups = {"cot": idx_cot, "qa": idx_qa,
              "all": list(range(len(preds["prompt"])))}
    for name, idxs in groups.items():
        rows = [(preds["language"][i], preds["language_gt"][i],
                 preds["path"][i]) for i in idxs]
        with open(os.path.join(cfg.output_dir,
                               f"language_preds_{name}.json"), "w") as f:
            json.dump(rows, f, indent=2)

    if idx_qa:
        sorted_samples: Dict[str, Dict[str, List]] = {}
        for i in idx_qa:
            t = preds["qa_templates"][i]
            if not t:
                continue
            q, a = t
            sorted_samples.setdefault(q, {}).setdefault(a, []).append(
                (preds["language"][i], preds["language_gt"][i],
                 preds["path"][i]))
        with open(os.path.join(cfg.output_dir,
                               "sorted_qa_templates.json"), "w") as f:
            json.dump(sorted_samples, f, indent=2)

    # ---- NLG metrics on the generated language
    results["metrics"] = metrics.evaluation_suite(preds["language"],
                                                  preds["language_gt"])

    # ---- dreamer success rates
    if cfg.mode == "Dreaming":
        rows = []
        for i, info in enumerate(preds["eval_infos"]):
            if not info:
                continue
            target_speed = _parse_target_speed(preds["prompt"][i])
            cur_speed = _parse_current_speed(preds["prompt"][i])
            success = dreamer_rules.evaluate_sample(
                info["mode"],
                np.asarray(preds["speed_wps"][i]),
                np.asarray(preds["route"][i]),
                np.asarray(info["org_wps"]), np.asarray(info["org_path"]),
                np.asarray(info["new_wps"]), np.asarray(info["new_path"]),
                cur_speed, target_speed)
            rows.append({"mode": info["mode"], "success": success,
                         "allowed": info.get("allowed", True)})
        results["dreamer"] = dreamer_rules.aggregate(rows)
        with open(os.path.join(cfg.output_dir,
                               "dreamer_results.json"), "w") as f:
            json.dump(results["dreamer"], f, indent=2)

    with open(os.path.join(cfg.output_dir, "eval_results.json"), "w") as f:
        json.dump(results, f, indent=2)
    return results


def _parse_current_speed(prompt: str) -> float:
    m = re.search(r"Current speed: ([\d.]+)", prompt)
    return float(m.group(1)) if m else 0.0


def _parse_target_speed(prompt: str) -> Optional[float]:
    m = re.search(r"(\d+(?:\.\d+)?) m/s[.!]?\s*$", prompt)
    try:
        return float(m.group(1)) if m else None
    except ValueError:
        return None
