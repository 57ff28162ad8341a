"""Minimal declarative config system (Hydra-style, dependency-free).

Parity targets from the reference's Hydra usage (SURVEY.md §5):
  - YAML config tree with ``_target_`` keys instantiated by dotted path
    (``hydra.utils.instantiate`` equivalent);
  - ``${a.b.c}`` interpolations resolved against the root config;
  - ``key.path=value`` command-line overrides.
"""
import importlib
import re
from pathlib import Path

import yaml

_INTERP = re.compile(r"^\$\{([^}]+)\}$")


def load_config(path, overrides=()):
    with open(path) as f:
        cfg = yaml.safe_load(f)
    cfg = apply_overrides(cfg, overrides)
    cfg = _resolve_interpolations(cfg, cfg)
    return cfg


def apply_overrides(cfg, overrides):
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value: {ov}")
        key, val = ov.split("=", 1)
        node = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = yaml.safe_load(val)
    return cfg


def _lookup(root, dotted):
    node = root
    for p in dotted.split("."):
        node = node[p]
    return node


def _resolve_interpolations(node, root):
    if isinstance(node, dict):
        return {k: _resolve_interpolations(v, root) for k, v in node.items()}
    if isinstance(node, list):
        return [_resolve_interpolations(v, root) for v in node]
    if isinstance(node, str):
        m = _INTERP.match(node)
        if m:
            return _resolve_interpolations(_lookup(root, m.group(1)), root)
    return node


def _import_target(dotted: str):
    mod, _, name = dotted.rpartition(".")
    return getattr(importlib.import_module(mod), name)


def instantiate(cfg, **extra):
    """Build the object described by a {_target_: ..., **kwargs} dict."""
    if not isinstance(cfg, dict) or "_target_" not in cfg:
        raise ValueError("instantiate needs a dict with _target_")
    kwargs = {k: v for k, v in cfg.items() if k != "_target_"}
    kwargs.update(extra)
    target = _import_target(cfg["_target_"])
    return target(**kwargs)


def to_dict(cfg):
    return yaml.safe_load(yaml.safe_dump(cfg))
