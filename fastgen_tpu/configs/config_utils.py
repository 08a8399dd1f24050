"""Config loading and CLI overrides.

Replaces the reference's Hydra/OmegaConf composition
(``fastgen/configs/config_utils.py:22-184``) with a dependency-free
implementation that keeps the same public surface:

* ``import_config_from_python_file(path)`` imports a python config file and
  calls its ``create_config()``.
* ``override_config_with_opts(config, ["a.b.c=1", "model.net.channels=64"])``
  applies dotted-path overrides onto the attrs/LazyDict tree, parsing values
  with ``ast.literal_eval`` (falling back to string).
* ``config_to_dict`` / ``save_config_yaml`` serialize the config for
  reproducibility (reference dumps ``config.yaml``, ``config_utils.py:221-317``).
"""

from __future__ import annotations

import ast
import importlib.util
import sys
from pathlib import Path
from typing import Any, List

import attrs
import yaml

from fastgen_tpu.configs.lazy import LazyDict, dump_target
from fastgen_tpu.utils import logging_utils as logger


def import_config_from_python_file(config_file: str) -> Any:
    """Import a python config file and return ``create_config()``."""
    path = Path(config_file)
    if not path.exists():
        raise FileNotFoundError(f"Config file not found: {config_file}")
    spec = importlib.util.spec_from_file_location(f"_fastgen_config_{path.stem}", str(path))
    module = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = module
    spec.loader.exec_module(module)
    if not hasattr(module, "create_config"):
        raise AttributeError(f"Config file {config_file} must define create_config()")
    return module.create_config()


def _parse_value(text: str) -> Any:
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        lowered = text.lower()
        if lowered == "true":
            return True
        if lowered == "false":
            return False
        if lowered in ("none", "null"):
            return None
        return text


def _get_child(obj: Any, key: str) -> Any:
    if isinstance(obj, dict):
        return obj[key]
    if isinstance(obj, (list, tuple)):
        return obj[int(key)]
    return getattr(obj, key)


def _set_child(obj: Any, key: str, value: Any) -> None:
    if isinstance(obj, dict):
        obj[key] = value
    elif isinstance(obj, list):
        obj[int(key)] = value
    else:
        if not hasattr(obj, key):
            raise AttributeError(f"Config object {type(obj).__name__} has no field {key!r}")
        setattr(obj, key, value)


def set_dotted(config: Any, dotted_key: str, value: Any) -> None:
    parts = dotted_key.split(".")
    obj = config
    for part in parts[:-1]:
        obj = _get_child(obj, part)
    _set_child(obj, parts[-1], value)


def get_dotted(config: Any, dotted_key: str) -> Any:
    obj = config
    for part in dotted_key.split("."):
        obj = _get_child(obj, part)
    return obj


def override_config_with_opts(config: Any, opts: List[str]) -> Any:
    """Apply ``key=value`` overrides (the reference's ``- key=value`` CLI surface)."""
    for opt in opts or []:
        if "=" not in opt:
            raise ValueError(f"Override must be of the form key=value, got {opt!r}")
        key, _, raw = opt.partition("=")
        value = _parse_value(raw)
        set_dotted(config, key.strip(), value)
        logger.debug(f"Config override: {key.strip()} = {value!r}")
    return config


def override_config_with_yaml(config: Any, yaml_file: str) -> Any:
    """Re-apply overrides from a saved yaml (reference ``config_utils.py:171-184``)."""
    with open(yaml_file) as f:
        data = yaml.safe_load(f)

    def _apply(prefix: str, node: Any) -> None:
        if isinstance(node, dict):
            for k, v in node.items():
                _apply(f"{prefix}.{k}" if prefix else str(k), v)
        else:
            try:
                set_dotted(config, prefix, node)
            except (AttributeError, KeyError, IndexError, TypeError):
                logger.debug(f"Skipping unknown yaml override key: {prefix}")

    _apply("", data)
    return config


def config_to_dict(config: Any) -> Any:
    """Recursively convert a config tree to plain python containers."""
    if isinstance(config, LazyDict) or (isinstance(config, dict) and "_target_" in config):
        out = {}
        for k, v in config.items():
            out[k] = dump_target(v) if k == "_target_" else config_to_dict(v)
        return out
    if isinstance(config, dict):
        return {k: config_to_dict(v) for k, v in config.items()}
    if isinstance(config, (list, tuple)):
        return [config_to_dict(v) for v in config]
    if attrs.has(type(config)):
        return {
            field.name: config_to_dict(getattr(config, field.name))
            for field in attrs.fields(type(config))
        }
    if isinstance(config, (str, int, float, bool)) or config is None:
        return config
    return repr(config)


def save_config_yaml(config: Any, path: str) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config_to_dict(config), f, sort_keys=False)
    logger.info(f"Saved config to {path}")
