"""YAML config loading with `_target_` instantiation and dotted overrides.

Light-weight equivalent of the reference's hydra/omegaconf stack
(SURVEY.md §5.6): YAML groups compose into one tree, `_target_` nodes
instantiate registered dataclasses (including Varying schedules inside
parameter dicts), `a.b.c=value` overrides apply with type coercion, and the
resolved config is persisted to the run dir and reloaded on resume.
"""

import dataclasses
import json
from pathlib import Path
from typing import Any, Dict

import yaml

from splat_trainer_tpu import config as schedules

_REGISTRY: Dict[str, Any] = {}


def register(cls, name: str | None = None):
    _REGISTRY[name or cls.__name__] = cls
    return cls


def _default_registry():
    from splat_trainer_tpu.config import (
        Between, Constant, Linear, LogDecay, LogLinear, Piecewise, Scaled,
        SmoothStep,
    )
    from splat_trainer_tpu.controller import DisabledConfig, MCMCConfig, TargetConfig
    from splat_trainer_tpu.models.color_model import ColorModelConfig
    from splat_trainer_tpu.models.mlp_scene import MLPSceneConfig
    from splat_trainer_tpu.models.sh_scene import SHSceneConfig
    from splat_trainer_tpu.trainer.config import TrainConfig
    from splat_trainer_tpu.trainer.init import CloudInitConfig
    from splat_trainer_tpu.trainer.view_selection import (
        BatchOverlapSamplerConfig, RandomSamplerConfig, TargetOverlapConfig,
    )
    from splat_trainer_tpu.data.normalization import NormalizationConfig
    from splat_trainer_tpu.color_corrector import (
        BilateralCorrectorConfig, NilCorrectorConfig,
    )

    for cls in [Constant, Linear, LogDecay, LogLinear, Piecewise, Scaled,
                SmoothStep, Between, TargetConfig, MCMCConfig, DisabledConfig,
                ColorModelConfig, MLPSceneConfig, SHSceneConfig, TrainConfig,
                CloudInitConfig,
                RandomSamplerConfig, BatchOverlapSamplerConfig,
                TargetOverlapConfig, NormalizationConfig,
                BilateralCorrectorConfig, NilCorrectorConfig]:
        register(cls)


def instantiate(node: Any) -> Any:
    """Recursively instantiate `_target_` nodes from the registry."""
    if not _REGISTRY:
        _default_registry()
    if isinstance(node, dict):
        resolved = {k: instantiate(v) for k, v in node.items() if k != "_target_"}
        if "_target_" in node:
            name = node["_target_"].split(".")[-1]
            if name not in _REGISTRY:
                raise KeyError(f"unknown _target_: {node['_target_']}")
            return _REGISTRY[name](**resolved)
        return resolved
    if isinstance(node, list):
        return [instantiate(v) for v in node]
    return node


def coerce(value: str) -> Any:
    """Type coercion for command-line overrides (reference
    scripts/checkpoint.py:106-114). YAML-parses scalars AND lists."""
    if value.lower() == "none":
        return None
    try:
        return yaml.safe_load(value)
    except yaml.YAMLError:
        return value


def apply_overrides(tree: dict, overrides: list) -> dict:
    """Apply `a.b.c=value` strings to a nested dict."""
    for ov in overrides:
        path, _, value = ov.partition("=")
        keys = path.strip().split(".")
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = coerce(value.strip())
    return tree


def load_config(path, overrides: list = ()) -> Any:
    with open(path) as f:
        tree = yaml.safe_load(f)
    tree = apply_overrides(tree, list(overrides))
    return tree


def save_resolved(path, tree: dict):
    with open(path, "w") as f:
        yaml.safe_dump(tree, f, sort_keys=False)


def config_to_tree(obj: Any) -> Any:
    """Dataclass config -> plain dict tree with _target_ keys (for saving)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        out = {"_target_": type(obj).__name__}
        for f in dataclasses.fields(obj):
            out[f.name] = config_to_tree(getattr(obj, f.name))
        return out
    if isinstance(obj, schedules.Varying):
        d = {"_target_": type(obj).__name__}
        d.update({k: config_to_tree(v) for k, v in vars(obj).items()})
        return d
    if isinstance(obj, dict):
        return {k: config_to_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [config_to_tree(v) for v in obj]
    return obj
