"""Unified config system: one NamedTuple tree + YAML load/save.

Replaces the reference's three config styles (SURVEY.md §5: argparse trees
in ROPNet/configs/arguments.py, YAML+EasyDict with section flattening in
ngenet/utils/yaml.py:4-11, and YAML-with-!join for NDP/Lepard) with a single
mechanism: every pipeline's config is an immutable NamedTuple (hashable, so
it can be a jit static argument); YAML round-trips through nested dicts with
`decode_config`-style section flattening supported for reference-format
files.
"""

from __future__ import annotations

import json
from typing import Any, NamedTuple

import yaml


def to_dict(cfg: Any) -> Any:
    """NamedTuple tree -> plain nested dict (JSON/YAML-serializable)."""
    if hasattr(cfg, "_asdict"):
        return {k: to_dict(v) for k, v in cfg._asdict().items()}
    if isinstance(cfg, (list, tuple)):
        return [to_dict(v) for v in cfg]
    return cfg


def from_dict(cls, data: dict):
    """Build a NamedTuple `cls` from a nested dict, recursing into fields
    whose defaults are themselves NamedTuples."""
    defaults = cls()
    kwargs = {}
    for k, v in data.items():
        if k not in cls._fields:
            continue
        cur = getattr(defaults, k)
        if hasattr(cur, "_asdict") and isinstance(v, dict):
            kwargs[k] = from_dict(type(cur), v)
        elif isinstance(cur, tuple) and not hasattr(cur, "_asdict"):
            kwargs[k] = tuple(v)
        else:
            kwargs[k] = v
    return defaults._replace(**kwargs)


def load_yaml(path: str, cls=None, flatten_sections: bool = False):
    """Load YAML; optionally flatten top-level sections into one namespace
    (the reference's decode_config, ngenet/utils/yaml.py:4-11)."""
    with open(path) as f:
        data = yaml.safe_load(f)
    if flatten_sections:
        flat = {}
        for section in data.values():
            if isinstance(section, dict):
                flat.update(section)
        data = flat
    if cls is None:
        return data
    return from_dict(cls, data)


def save_yaml(cfg: Any, path: str) -> None:
    """Persist a config next to its artifacts (the reference copies the
    yaml beside checkpoints, trainNgeNet.py:40)."""
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)


def save_json(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2)
