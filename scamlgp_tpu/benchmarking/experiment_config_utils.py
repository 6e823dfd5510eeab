"""Experiment configuration dataclass + SHA-256 fingerprinting (reference
``/root/reference/scamlgp/benchmarking/experiment_config_utils.py:13-115``).

The hash keys the results directory, so config changes automatically
invalidate old results; the ``compute`` field and machine-specific data paths
are excluded from the fingerprint.
"""

from __future__ import annotations

import hashlib
import importlib
import json
from copy import deepcopy
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Dict, Type, Union


@dataclass
class Experiment:
    optimizer: Union[dict, Type]
    benchmark: Union[dict, Type]
    n_evaluations: int
    n_studies: int
    compute: str

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Experiment):
            return False
        return hash_experiment_config(self) == hash_experiment_config(other)


def _parse_simple_type(value: Any) -> Union[str, int, float]:
    """Closest simple-type representation: numerics cast, classes/objects ->
    dotted module.class strings (reference ``:28-46``)."""
    try:
        return int(value)
    except (ValueError, TypeError):
        try:
            return float(value)
        except (ValueError, TypeError):
            if str(value).startswith("<class"):
                return f"{value.__module__}.{value.__name__}"
            elif "object at" in str(value):
                return f"{value.__class__.__module__}.{value.__class__.__name__}"
            else:
                return str(value)


def parse_experiment_config(config):
    """Recursively normalize a config to simple types only."""
    if isinstance(config, dict):
        return {k: parse_experiment_config(v) for k, v in config.items()}
    elif isinstance(config, list):
        return [parse_experiment_config(v) for v in config]
    else:
        return _parse_simple_type(config)


def hash_experiment_config(config: Experiment, short: bool = False) -> str:
    """SHA-256 of the simple-type-normalized config, excluding ``compute`` and
    machine-specific data paths (reference ``:63-100``)."""
    config_dict = deepcopy(config.__dict__)
    config_dict.pop("compute")

    if (isinstance(config_dict["benchmark"], dict)
            and "kwargs" in config_dict["benchmark"]):
        config_dict["benchmark"]["kwargs"].pop("data_dir", None)
        if "target_task_file" in config_dict["benchmark"]["kwargs"]:
            config_dict["benchmark"]["kwargs"]["target_task_file"] = Path(
                config_dict["benchmark"]["kwargs"]["target_task_file"]).name
        if "meta_task_files" in config_dict["benchmark"]["kwargs"]:
            config_dict["benchmark"]["kwargs"]["meta_task_files"] = [
                Path(mtf).name
                for mtf in config_dict["benchmark"]["kwargs"]["meta_task_files"]
            ]

    parsed = parse_experiment_config(config_dict)
    config_hash = hashlib.sha256(json.dumps(parsed).encode()).hexdigest()
    return config_hash[:7] if short else config_hash


def get_experiments_config_from_module(module: str) -> Dict[str, Experiment]:
    """Load the global ``EXPERIMENTS`` dict from a module (reference
    ``:103-115``)."""
    _module = importlib.import_module(module)
    if not hasattr(_module, "EXPERIMENTS"):
        raise ValueError(
            f"Module {module} is missing the global variable EXPERIMENTS that "
            "contains all experiment configurations.")
    return _module.EXPERIMENTS
