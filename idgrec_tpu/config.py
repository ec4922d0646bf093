"""Typed configuration system.

Parses the reference's flat ``key = value`` text files (syntax per
reference utility/utility_function/tools.py:17-32) into a typed `Config`.
Differences from the reference, by design:

* no ``eval`` — list/bool/number values are parsed with
  ``ast.literal_eval`` and validated;
* typed accessors with clear errors instead of ad-hoc ``int()/float()``
  coercion at use sites;
* schema defaults so that configs missing keys the engine always reads
  (the reference crashes on DirectAU/MAWU which lack ``interval``,
  trainer.py:66) still run.

The key census (reference README.md:60-73 and configure/*.txt) is the
common schema; model-specific keys ride in the same flat namespace.
"""

from __future__ import annotations

import ast
import os
from typing import Any, Iterator, Mapping

_COMMON_DEFAULTS: dict[str, str] = {
    # Engine keys read unconditionally by the trainer/evaluator.
    "interval": "1",
    "sparsity_test": "0",
    "early_stopping": "10",
    "test_batch_size": "2048",
    "top_K": "[10, 20]",
    # Numerics / run policy (new in this framework; safe defaults).
    "seed": "2024",
    "compute_dtype": "bfloat16",
    "propagation_backend": "auto",
}


class ConfigError(KeyError):
    """A config key is missing or has an unusable value."""


class Config(Mapping[str, str]):
    """A flat string->string config with typed accessors.

    Stores values as strings (to round-trip and log exactly what was
    parsed, matching the reference's config-dump behavior main.py:91-93)
    and converts on access.
    """

    def __init__(self, values: Mapping[str, str] | None = None, *, name: str = "config"):
        self._values: dict[str, str] = dict(_COMMON_DEFAULTS)
        if values:
            self._values.update({str(k): str(v) for k, v in values.items()})
        self.name = name

    # -- Mapping interface -------------------------------------------------
    def __getitem__(self, key: str) -> str:
        try:
            return self._values[key]
        except KeyError:
            raise ConfigError(f"{self.name}: missing config key {key!r}") from None

    def __iter__(self) -> Iterator[str]:
        return iter(self._values)

    def __len__(self) -> int:
        return len(self._values)

    def __contains__(self, key: object) -> bool:
        return key in self._values

    # -- typed accessors ---------------------------------------------------
    def int(self, key: str, default: int | None = None) -> int:
        return int(self._typed(key, default))

    def float(self, key: str, default: float | None = None) -> float:
        return float(self._typed(key, default))

    def str(self, key: str, default: str | None = None) -> str:
        return str(self._typed(key, default))

    def bool(self, key: str, default: bool | None = None) -> bool:
        raw = self._typed(key, default)
        if isinstance(raw, bool):
            return raw
        text = str(raw).strip().lower()
        if text in ("true", "1", "yes"):
            return True
        if text in ("false", "0", "no"):
            return False
        raise ConfigError(f"{self.name}: key {key!r}={raw!r} is not a boolean")

    def list(self, key: str, default: list | None = None) -> list:
        raw = self._typed(key, default)
        if isinstance(raw, list):
            return raw
        try:
            value = ast.literal_eval(str(raw))
        except (ValueError, SyntaxError) as e:
            raise ConfigError(f"{self.name}: key {key!r}={raw!r} is not a literal list") from e
        if not isinstance(value, (list, tuple)):
            raise ConfigError(f"{self.name}: key {key!r}={raw!r} is not a list")
        return list(value)

    def int_list(self, key: str, default: list[int] | None = None) -> list[int]:
        return [int(v) for v in self.list(key, default)]

    def float_list(self, key: str, default: list[float] | None = None) -> list[float]:
        return [float(v) for v in self.list(key, default)]

    def _typed(self, key: str, default: Any) -> Any:
        if key in self._values:
            return self._values[key]
        if default is not None:
            return default
        raise ConfigError(f"{self.name}: missing config key {key!r}")

    # -- mutation / derivation --------------------------------------------
    def updated(self, **overrides: Any) -> "Config":
        merged = dict(self._values)
        merged.update({k: str(v) for k, v in overrides.items()})
        return Config(merged, name=self.name)

    def set(self, key: str, value: Any) -> None:
        self._values[key] = str(value)

    def as_dict(self) -> dict[str, str]:
        return dict(self._values)

    def __repr__(self) -> str:
        return f"Config({self.name!r}, {self._values!r})"


def read_configuration(path: str, *, name: str | None = None) -> Config:
    """Read a reference-format config file.

    Same line grammar as the reference (``key = value``, malformed lines
    are warned about and skipped; tools.py:22-31).
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"no configuration file at {path}")
    values: dict[str, str] = {}
    with open(path, "r") as f:
        for lineno, line in enumerate(f, start=1):
            text = line.strip()
            if not text or text.startswith("#"):
                continue
            key, sep, value = text.partition("=")
            if not sep:
                print(f"\tConfiguration file format error ({path}:{lineno}).")
                continue
            values[key.strip()] = value.strip()
    return Config(values, name=name or os.path.basename(path))


def default_configure_dir() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)), "configure")


def load_model_config(model: str, configure_dir: str | None = None) -> Config:
    """Load ``<configure_dir>/<model>.txt`` (reference main.py:58-62)."""
    directory = configure_dir or default_configure_dir()
    return read_configuration(os.path.join(directory, f"{model}.txt"), name=model)
