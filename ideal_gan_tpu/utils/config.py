"""Experiment configuration with the reference's YAML overlay semantics.

The reference's global-parser pattern (pylib/argument.py:8-81): every run
serializes `settings.yml`; downstream scripts load the *training run's*
YAML, overlay their own flags, and backfill missing legacy keys with
defaults (train-ldm.py:32-45, test-genMetrics.py:25-26). `Config` keeps
that workflow: attribute-style access, `save`/`load` YAML round-trip,
`overlay` (new flags win), and `backfill` (defaults fill holes only).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Mapping

import yaml


class Config(dict):
    """dict with attribute access and YAML round-trip."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    # -- persistence ---------------------------------------------------
    def save(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        with open(path, "w") as f:
            yaml.safe_dump(dict(self), f, sort_keys=False)

    @classmethod
    def load(cls, path: str | Path) -> "Config":
        with open(path) as f:
            return cls(yaml.safe_load(f) or {})

    # -- reference overlay semantics ------------------------------------
    def overlay(self, other: Mapping[str, Any]) -> "Config":
        """Return a new Config where `other`'s entries win (the downstream
        script's own flags overriding the training run's settings)."""
        out = Config(self)
        out.update(other)
        return out

    def backfill(self, defaults: Mapping[str, Any]) -> "Config":
        """Return a new Config where `defaults` fill only missing keys
        (the reference's `if not hasattr(args, k)` guards)."""
        out = Config(defaults)
        out.update(self)
        return out


def parse_flags(defaults: Mapping[str, Any], argv=None) -> Config:
    """Build a Config from defaults + command-line flags (the `py.arg`
    pattern: every default becomes a typed --flag; bools accept
    true/false; dict/list flags accept JSON)."""
    parser = argparse.ArgumentParser()
    for key, val in defaults.items():
        if isinstance(val, bool):
            parser.add_argument(f"--{key}", type=_parse_bool, default=val)
        elif isinstance(val, (dict, list, tuple)):
            parser.add_argument(f"--{key}", type=json.loads,
                                default=json.dumps(list(val) if
                                                   isinstance(val, tuple)
                                                   else val))
        elif val is None:
            parser.add_argument(f"--{key}", type=str, default=None)
        else:
            parser.add_argument(f"--{key}", type=type(val), default=val)
    ns = parser.parse_args(argv)
    cfg = Config(vars(ns))
    for key, val in cfg.items():
        if isinstance(val, str) and isinstance(defaults.get(key),
                                               (dict, list, tuple)):
            cfg[key] = json.loads(val)
    return cfg


def _parse_bool(v: str) -> bool:
    if isinstance(v, bool):
        return v
    if v.lower() in ("true", "1", "yes"):
        return True
    if v.lower() in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"boolean expected, got {v!r}")
