"""Model registry.

Replaces the reference's ``exec('from models.<NAME> import Trainer')``
dynamic plugin loading (main.py:58-60,85-87) with an explicit decorator
registry. The portable model contract (SURVEY.md §1) is preserved:
a model is (a) loss terms over a sampled batch and (b) a full-catalog
scorer — see `idgrec_tpu.models.base.RecModel`.
"""

from __future__ import annotations

from typing import Callable, Type

_REGISTRY: dict[str, type] = {}


def register(name: str) -> Callable[[type], type]:
    def deco(cls: type) -> type:
        if name in _REGISTRY and _REGISTRY[name] is not cls:
            raise ValueError(f"model {name!r} already registered")
        _REGISTRY[name] = cls
        cls.model_name = name
        return cls

    return deco


def get_model(name: str) -> type:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}"
        ) from None


def available_models() -> list[str]:
    return sorted(_REGISTRY)
