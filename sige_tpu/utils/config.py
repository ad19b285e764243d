"""Config system: YAML -> attribute-access config + dot-path overrides.

The reference uses three config styles (reference: SURVEY aux systems):
YAML->EasyDict with an ``--hparams "a.b=c d=e"`` override parser
(diffusion/utils.py:12-68), plain argparse (gaugan), and OmegaConf with
``target:`` class paths (stable-diffusion). This module provides the
first style natively (an ``AttrDict``) plus a tiny ``instantiate``
resolving dotted class paths for config-driven engine swaps."""

from __future__ import annotations

import importlib
from typing import Any

import yaml


class AttrDict(dict):
    """dict with attribute access, recursively."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v

    @classmethod
    def convert(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.convert(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.convert(v) for v in obj]
        return obj


def load_config(path: str) -> AttrDict:
    with open(path) as f:
        return AttrDict.convert(yaml.safe_load(f))


def parse_value(value: str, original: Any = None):
    """Type-inferring scalar/list parser (reference: diffusion/utils.py:33-68)."""
    value = value.strip()
    low = value.lower()
    if "," in value:
        return [parse_value(v) for v in value.split(",")]
    if low == "none":
        ret: Any = None
    elif low == "true":
        ret = True
    elif low == "false":
        ret = False
    else:
        try:
            ret = int(value)
        except ValueError:
            try:
                ret = float(value)
            except ValueError:
                ret = value
    if isinstance(original, (list, tuple)) and not isinstance(ret, list):
        return [ret]
    return ret


def override_config(config: AttrDict, hparams: str) -> AttrDict:
    """Apply ``"a.b=c x=1,2"`` style dot-path overrides in place."""
    for item in hparams.strip().split():
        if "=" not in item:
            continue
        key, value = item.split("=", 1)
        keys = key.split(".")
        node = config
        for k in keys[:-1]:
            if k not in node or not isinstance(node[k], dict):
                node[k] = AttrDict()
            node = node[k]
        node[keys[-1]] = parse_value(value, node.get(keys[-1]))
    return config


def instantiate(target: str, /, **kwargs):
    """Resolve a dotted ``module.Class`` path and construct it — the
    OmegaConf ``target:`` pattern that makes dense<->SIGE a two-line
    config diff (reference: stable-diffusion/configs/{original,sige}.yaml)."""
    module, _, name = target.rpartition(".")
    return getattr(importlib.import_module(module), name)(**kwargs)
