"""Unified typed config system.

The reference uses two config systems — argparse namespaces on the HHI
side (HHI/configs/ttm/config.py:10-55) and fvcore/yacs CfgNode + YAML +
CLI ``opts`` overrides on the HOI side (HOI/utils/pnr/parser.py:46-68).
This module unifies them: one attribute-accessible nested config with

  * programmatic defaults (per-task default trees live next to tasks),
  * YAML file merge (``Config.from_yaml`` / ``cfg.merge_yaml``),
  * dotted-key CLI override lists (``cfg.merge_dotlist(["SOLVER.LR", "1e-4"])``),
  * freezing to catch typos after construction.

Values keep the same knob names as the reference where they map 1:1 so
that users of the reference can find them (e.g. ``DATA.SAMPLING_FPS``,
``FORECASTING.NUM_INPUT_CLIPS``).
"""

from __future__ import annotations

import ast
import copy
import io
from typing import Any, Dict, List, Optional


def _coerce(value: str) -> Any:
    """Parse a CLI string into a python literal when possible."""
    if not isinstance(value, str):
        return value
    try:
        return ast.literal_eval(value)
    except (ValueError, SyntaxError):
        return value


class Config(dict):
    """Nested dict with attribute access, merge, and freeze."""

    _FROZEN_KEY = "__frozen__"

    def __init__(self, data: Optional[Dict[str, Any]] = None, **kwargs):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        merged = dict(data or {})
        merged.update(kwargs)
        for k, v in merged.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v: Any) -> Any:
        if isinstance(v, Config):
            return v
        if isinstance(v, dict):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    # -- attribute access -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if self._is_frozen() and name not in self:
            raise AttributeError(
                f"Config is frozen; cannot add new key {name!r}"
            )
        self[name] = self._wrap(value)

    def _is_frozen(self) -> bool:
        try:
            return object.__getattribute__(self, "_frozen")
        except AttributeError:
            return False

    def freeze(self, recursive: bool = True) -> "Config":
        object.__setattr__(self, "_frozen", True)
        if recursive:
            for v in self.values():
                if isinstance(v, Config):
                    v.freeze()
        return self

    def defrost(self) -> "Config":
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, Config):
                v.defrost()
        return self

    def clone(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def to_dict(self) -> Dict[str, Any]:
        out: Dict[str, Any] = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, (list, tuple)):
                out[k] = type(v)(
                    x.to_dict() if isinstance(x, Config) else x for x in v
                )
            else:
                out[k] = v
        return out

    # -- merging ----------------------------------------------------------
    def merge(self, other: Dict[str, Any], allow_new: bool = True) -> "Config":
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), Config):
                self[k].merge(v, allow_new=allow_new)
            else:
                if not allow_new and k not in self:
                    raise KeyError(f"Unknown config key {k!r}")
                dict.__setitem__(self, k, self._wrap(v))
        return self

    def merge_dotlist(self, opts: List[Any]) -> "Config":
        """Merge ``["A.B.C", val, ...]`` pairs (reference CLI ``opts``)."""
        if len(opts) % 2 != 0:
            raise ValueError(f"dotlist must have even length, got {opts}")
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = str(key).split(".")
            for p in parts[:-1]:
                if p not in node or not isinstance(node[p], Config):
                    dict.__setitem__(node, p, Config())
                node = node[p]
            dict.__setitem__(node, parts[-1], self._wrap(_coerce(value)))
        return self

    def merge_yaml(self, path_or_stream) -> "Config":
        import yaml

        if hasattr(path_or_stream, "read"):
            data = yaml.safe_load(path_or_stream)
        else:
            with open(path_or_stream) as f:
                data = yaml.safe_load(f)
        return self.merge(data or {})

    @classmethod
    def from_yaml(cls, path_or_stream) -> "Config":
        cfg = cls()
        return cfg.merge_yaml(path_or_stream)

    def dump_yaml(self) -> str:
        import yaml

        buf = io.StringIO()
        yaml.safe_dump(self.to_dict(), buf, sort_keys=True)
        return buf.getvalue()

    def get_path(self, dotted: str, default: Any = None) -> Any:
        node: Any = self
        for p in dotted.split("."):
            if not isinstance(node, dict) or p not in node:
                return default
            node = node[p]
        return node
