"""Config loading: defaults ← YAML ← programmatic overrides, deep-merged then
validated (reference contract: etude/config/loader.py)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Union

import yaml

from .schema import EtudeConfig
from ..utils.logger import logger


def _deep_merge(base: Dict[str, Any], update: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for key, value in update.items():
        if key in out and isinstance(out[key], dict) and isinstance(value, dict):
            out[key] = _deep_merge(out[key], value)
        else:
            out[key] = value
    return out


def load_config(
    config_path: Optional[Union[str, Path]] = None,
    overrides: Optional[Dict[str, Any]] = None,
) -> EtudeConfig:
    """Build an EtudeConfig from defaults, an optional YAML file, and optional
    programmatic overrides (highest priority)."""
    merged: Dict[str, Any] = {}

    if config_path is not None:
        config_path = Path(config_path)
        if config_path.exists():
            with open(config_path, "r", encoding="utf-8") as f:
                yaml_data = yaml.safe_load(f) or {}
            merged = _deep_merge(merged, yaml_data)
            logger.debug(f"Loaded config overrides from {config_path}")
        else:
            logger.warn(f"Config file not found: {config_path}; using defaults.")

    if overrides:
        merged = _deep_merge(merged, overrides)

    return EtudeConfig(**merged)


def save_config(config: EtudeConfig, path: Union[str, Path]) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    data = json.loads(config.model_dump_json())
    if path.suffix in {".yaml", ".yml"}:
        with open(path, "w", encoding="utf-8") as f:
            yaml.safe_dump(data, f, sort_keys=False)
    else:
        with open(path, "w", encoding="utf-8") as f:
            json.dump(data, f, indent=2)
    logger.debug(f"Config saved to {path}")
