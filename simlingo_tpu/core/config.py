"""Config system: typed dataclasses + YAML overlays + CLI dotted overrides.

Counterpart of the reference's Hydra setup (config.py:246-330 +
config/**yaml): same three-level composition (dataclass defaults -> named
experiment overlay -> CLI `a.b.c=value` overrides) without the Hydra
dependency. Experiments live in configs/*.yaml at the repo root.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Tuple

from simlingo_tpu.data.collate import CollateConfig
from simlingo_tpu.data.driving_dataset import DrivingDatasetConfig
from simlingo_tpu.models.simlingo import SimLingoConfig
from simlingo_tpu.train.train_step import OptimizerConfig


@dataclasses.dataclass
class MeshConfig:
    dp: int = -1       # -1 => fill remaining devices
    fsdp: int = 1
    tp: int = 1
    sp: int = 1        # sequence axis (ring attention, parallel/sequence.py)
    pp: int = 1        # pipeline axis (LLM layer stages, parallel/pipeline.py)
    pp_microbatches: int = 0  # 0 => one microbatch per pipeline stage


@dataclasses.dataclass
class DataConfig:
    data_root: str = "database/simlingo"
    bucket_path: Optional[str] = None
    batch_size: int = 6
    num_workers: int = 8
    # train_partitions: bucket name -> weight (None => single 'all' bucket)
    train_partitions: Optional[Dict[str, float]] = None
    train_partitions_dreamer: Optional[Dict[str, float]] = None
    use_dreamer: bool = False
    max_text_len: int = 768
    base: DrivingDatasetConfig = dataclasses.field(
        default_factory=lambda: DrivingDatasetConfig(data_root=""))


@dataclasses.dataclass
class TrainConfig:
    seed: int = 42
    name: str = "simlingo_tpu"
    output_dir: str = "outputs"
    max_epochs: int = 15
    max_steps: int = -1
    val_every_n_epochs: int = 2        # 0 disables the validation loop
    val_max_batches: int = -1          # -1 = the full routes_validation split
    checkpoint_every_n_steps: int = 2000
    keep_checkpoints: int = 3
    log_every_n_steps: int = 50
    visualise_every_n_steps: int = 1000
    precision: str = "bf16"            # compute dtype (params fp32 master)
    resume: bool = False
    tokenizer_path: Optional[str] = None
    hf_checkpoint: Optional[str] = None   # init weights from HF/torch ckpt
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: SimLingoConfig = dataclasses.field(default_factory=SimLingoConfig)
    optimizer: OptimizerConfig = dataclasses.field(
        default_factory=OptimizerConfig)


# ---------------------------------------------------------------------------
# Composition
# ---------------------------------------------------------------------------

def _coerce(value: str, current: Any) -> Any:
    if isinstance(current, bool):
        return value.lower() in ("1", "true", "yes")
    if isinstance(current, int) and not isinstance(current, bool):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if value.lower() in ("null", "none"):
        return None
    try:
        return json.loads(value)
    except Exception:
        return value


def _apply(obj: Any, dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    for p in parts[:-1]:
        if dataclasses.is_dataclass(obj):
            obj = getattr(obj, p)
        elif isinstance(obj, dict):
            obj = obj[p]
        else:
            raise KeyError(f"cannot descend into {p!r} of {type(obj)}")
    last = parts[-1]
    if dataclasses.is_dataclass(obj):
        current = getattr(obj, last)
        if isinstance(value, str):
            value = _coerce(value, current)
        object.__setattr__(obj, last, value)
    elif isinstance(obj, dict):
        obj[last] = value
    else:
        raise KeyError(f"cannot set {last!r} on {type(obj)}")


def _apply_tree(obj: Any, tree: Dict[str, Any], prefix: str = "") -> None:
    for k, v in tree.items():
        dotted = f"{prefix}{k}"
        if isinstance(v, dict):
            # descend unless the target is itself a plain dict field
            try:
                target = obj
                for p in dotted.split("."):
                    target = getattr(target, p) if dataclasses.is_dataclass(
                        target) else target[p]
            except Exception:
                target = None
            if dataclasses.is_dataclass(target):
                _apply_tree(obj, v, dotted + ".")
                continue
        _apply(obj, dotted, v)


def load_yaml(path: str) -> Dict[str, Any]:
    try:
        import yaml
        with open(path) as f:
            return yaml.safe_load(f) or {}
    except ImportError:
        with open(path) as f:
            return json.load(f)


def compose(experiment: Optional[str] = None,
            overrides: Optional[List[str]] = None,
            config_dir: str = "configs") -> TrainConfig:
    """TrainConfig <- defaults <- configs/<experiment>.yaml <- CLI overrides."""
    cfg = TrainConfig()
    if experiment:
        path = experiment if os.path.isfile(experiment) else os.path.join(
            config_dir, f"{experiment}.yaml")
        _apply_tree(cfg, load_yaml(path))
    for ov in overrides or []:
        key, _, value = ov.partition("=")
        _apply(cfg, key, value)
    return cfg


def to_dict(cfg: Any) -> Any:
    if dataclasses.is_dataclass(cfg):
        return {f.name: to_dict(getattr(cfg, f.name))
                for f in dataclasses.fields(cfg)}
    if isinstance(cfg, dict):
        return {k: to_dict(v) for k, v in cfg.items()}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    if hasattr(cfg, "dtype") and hasattr(cfg, "shape"):
        return repr(cfg)
    return cfg
