"""JSON / YAML / pickle save-load with extension fixing and a parallel map
(rebuild of pylib/serialization.py and pylib/processing.py)."""

from __future__ import annotations

import json
import pickle
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from pathlib import Path

import yaml


def _fix_ext(path: str, ext: str) -> Path:
    p = Path(path)
    if p.suffix != f".{ext}":
        p = p.with_suffix(f".{ext}")
    return p


def save_json(path, obj, **kw):
    p = _fix_ext(path, "json")
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "w") as f:
        json.dump(obj, f, **kw)
    return str(p)


def load_json(path):
    with open(_fix_ext(path, "json")) as f:
        return json.load(f)


def save_yaml(path, obj, **kw):
    p = _fix_ext(path, "yml")
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "w") as f:
        yaml.safe_dump(obj, f, sort_keys=False, **kw)
    return str(p)


def load_yaml(path):
    with open(_fix_ext(path, "yml")) as f:
        return yaml.safe_load(f)


def save_pickle(path, obj):
    p = _fix_ext(path, "pkl")
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "wb") as f:
        pickle.dump(obj, f)
    return str(p)


def load_pickle(path):
    with open(_fix_ext(path, "pkl"), "rb") as f:
        return pickle.load(f)


def run_parallels(fn, iterable, max_workers: int | None = None,
                  mode: str = "thread"):
    """Parallel map over an iterable (reference pylib/processing.py:6-32
    Pool/ThreadPool capability)."""
    pool_cls = ThreadPoolExecutor if mode == "thread" else ProcessPoolExecutor
    with pool_cls(max_workers=max_workers) as pool:
        return list(pool.map(fn, iterable))
