"""Run logging in the reference's golden-trace format.

The reference logs to ``log/<MODEL>/<dataset>.log`` with
``%(asctime)s - %(message)s`` lines (main.py:64-72); the committed
EGCF log (log/EGCF/yelp2018.log) is its de-facto regression trace.
This module reproduces that schema and additionally writes structured
JSONL alongside for tooling.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any


class RunLogger:
    def __init__(self, model_name: str, dataset_name: str, log_dir: str | None = "log", echo: bool = True):
        self.echo = echo
        self._logger = logging.getLogger(f"idgrec_tpu.{model_name}.{dataset_name}.{id(self)}")
        self._logger.setLevel(logging.INFO)
        self._logger.propagate = False
        self._jsonl_path = None
        if log_dir is not None:
            model_dir = os.path.join(log_dir, model_name)
            os.makedirs(model_dir, exist_ok=True)
            handler = logging.FileHandler(
                os.path.join(model_dir, f"{dataset_name}.log"), "a", encoding="utf-8"
            )
            handler.setFormatter(logging.Formatter("%(asctime)s - %(message)s"))
            self._logger.addHandler(handler)
            self._jsonl_path = os.path.join(model_dir, f"{dataset_name}.jsonl")

    def info(self, message: str) -> None:
        self._logger.info(message)
        if self.echo:
            print(message)

    def event(self, **payload: Any) -> None:
        if self._jsonl_path:
            payload.setdefault("time", time.time())
            with open(self._jsonl_path, "a", encoding="utf-8") as f:
                f.write(json.dumps(payload, default=_jsonable) + "\n")

    def close(self) -> None:
        for h in list(self._logger.handlers):
            h.close()
            self._logger.removeHandler(h)


def _jsonable(x: Any):
    try:
        import numpy as np

        if isinstance(x, np.ndarray):
            return x.tolist()
        if isinstance(x, (np.floating, np.integer)):
            return x.item()
    except ImportError:
        pass
    return str(x)


def loss_string(term_sums, num_batch: int) -> str:
    """``total = t1 + t2 + ...`` with the reference's rounding and
    normalization (trainer.py:60-61: divide by len//B + 1)."""
    terms = [float(t) / num_batch for t in term_sums]
    return (
        str(round(sum(terms), 6)) + " = " + " + ".join(str(round(t, 6)) for t in terms)
    )
