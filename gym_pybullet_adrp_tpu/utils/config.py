"""YAML config system with attribute access.

Replaces the reference's munch-based loader (reference utils/utils.py:95-108)
without the munch dependency: nested dicts become ``AttrDict`` with both
``cfg.key`` and ``cfg["key"]`` access. Race scenario configs live in
``configs/`` and follow the reference's 5-level randomization ladder
(reference config/*.yaml, SURVEY §5).
"""

from pathlib import Path

import yaml

CONFIG_DIR = Path(__file__).resolve().parent.parent.parent / "configs"


class AttrDict(dict):
    """dict with attribute-style access, recursively applied."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value

    @classmethod
    def convert(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.convert(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.convert(v) for v in obj]
        return obj


def load_config(path) -> AttrDict:
    """Load a YAML scenario config (reference utils.py:95-108).

    Accepts an absolute/relative path or the bare name of a bundled config
    (e.g. "getting_started" or "level2.yaml").
    """
    p = Path(path)
    if not p.exists():
        candidate = CONFIG_DIR / (p.name if p.suffix else p.name + ".yaml")
        if candidate.exists():
            p = candidate
        else:
            raise FileNotFoundError(f"config not found: {path}")
    with open(p, "r") as f:
        raw = yaml.safe_load(f)
    return AttrDict.convert(raw)
