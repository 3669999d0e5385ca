"""Config system: YAML + deep-merged override blocks.

Mirrors the semantics of the reference's libreasr/lib/config.py:
- ``open_config`` (config.py:33)
- deep-merge of ``overrides.{inference,<lang>}`` blocks (config.py:101-110)
- data-driven pipeline stages resolved by name (config.py:45-69) — here the
  stage names map to pure-JAX frontend stages (see data/transforms.py).

The TPU build replaces the reference's ``cuda:`` block with a ``mesh:``
block describing the device mesh (data/model axes).
"""

from __future__ import annotations

import copy
import os
from typing import Any

import yaml

DEFAULT_CONFIG = os.path.join(os.path.dirname(__file__), "..", "config", "base.yaml")


def deep_update(dst: dict, src: dict) -> dict:
    """Recursive dict merge, src wins (reference config.py update():23)."""
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            deep_update(dst[k], v)
        else:
            dst[k] = v
    return dst


def open_config(path: str | None = None) -> dict:
    """Load a YAML config file (reference config.py:33)."""
    path = path or os.environ.get("LIBREASR_CONFIG", DEFAULT_CONFIG)
    with open(path) as f:
        return yaml.safe_load(f)


def apply_overrides(conf: dict, blocks: list[str]) -> dict:
    """Deep-merge ``conf['overrides'][block]`` for each block, in order
    (reference config.py:101-110). Unknown blocks are ignored (the
    reference tolerates a missing lang block the same way)."""
    conf = copy.deepcopy(conf)
    overrides = conf.get("overrides", {}) or {}
    for b in blocks:
        if b in overrides and overrides[b]:
            deep_update(conf, copy.deepcopy(overrides[b]))
    return conf


def parse_and_apply_config(
    *, inference: bool = False, lang: str = "", path: str | None = None
) -> dict:
    """Open + merge overrides; returns the resolved conf dict.

    Unlike the reference (config.py:96-168), this does *not* construct the
    whole world as a side effect — object construction lives with the
    objects (`Transducer.from_config`, `ASRDataset.from_config`, ...) so the
    pieces stay independently testable.
    """
    conf = open_config(path)
    blocks = []
    if lang:
        blocks.append(lang)
        conf["lang"] = lang
    if inference:
        blocks.append("inference")
    return apply_overrides(conf, blocks)


def conf_get(conf: dict, dotted: str, default: Any = None) -> Any:
    """`conf_get(conf, "model.encoder.num_layers")` convenience accessor."""
    node = conf
    for part in dotted.split("."):
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return node
