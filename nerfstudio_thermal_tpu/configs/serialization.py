"""Config YAML round-trip.

Behavioral spec: reference persists the full TrainerConfig as YAML at launch
(`scripts/train.py:245`) and `ns-eval`/`ns-render`/`ns-viewer` reload it via
`eval_setup` (`utils/eval_utils.py`). Here configs are plain dataclasses; we
tag each node with its class path for faithful reconstruction.
"""

import dataclasses
import importlib
from pathlib import Path
from typing import Any

import yaml


def to_dict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        out = {"__class__": f"{type(obj).__module__}:{type(obj).__qualname__}"}
        for f in dataclasses.fields(obj):
            out[f.name] = to_dict(getattr(obj, f.name))
        return out
    if isinstance(obj, dict):
        return {k: to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_dict(v) for v in obj]
    if isinstance(obj, Path):
        return {"__path__": str(obj)}
    return obj


def from_dict(data: Any) -> Any:
    if isinstance(data, dict):
        if "__path__" in data:
            return Path(data["__path__"])
        if "__class__" in data:
            module, qualname = data["__class__"].split(":")
            cls = importlib.import_module(module)
            for part in qualname.split("."):
                cls = getattr(cls, part)
            kwargs = {
                k: from_dict(v) for k, v in data.items() if k != "__class__"
            }
            field_names = {f.name for f in dataclasses.fields(cls)}
            return cls(**{k: v for k, v in kwargs.items() if k in field_names})
        return {k: from_dict(v) for k, v in data.items()}
    if isinstance(data, list):
        return [from_dict(v) for v in data]
    return data


def save_config(config: Any, path: Path) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(yaml.safe_dump(to_dict(config), sort_keys=False))


def load_config(path: Path) -> Any:
    cfg = from_dict(yaml.safe_load(Path(path).read_text()))
    # dataclass fields declared as tuples arrive as lists from YAML
    return _fix_tuples(cfg)


def _fix_tuples(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        import typing

        hints = typing.get_type_hints(type(obj))
        for f in dataclasses.fields(obj):
            val = getattr(obj, f.name)
            val = _fix_tuples(val)
            if isinstance(val, list) and typing.get_origin(hints.get(f.name)) is tuple:
                val = tuple(val)
            setattr(obj, f.name, val)
        return obj
    if isinstance(obj, dict):
        return {k: _fix_tuples(v) for k, v in obj.items()}
    return obj
