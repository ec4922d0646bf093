"""Tracing / throughput observability.

The reference's only instrumentation is wall-clock epoch timing
(trainer.py:22,58) and tqdm bars. Here (SURVEY §5 plan):

* `maybe_trace` — context manager around `jax.profiler.trace`; gated
  by a directory argument (config key `profile_dir` / CLI
  `--profile_dir`), producing TensorBoard-loadable traces of the
  jitted epoch/eval programs;
* `ThroughputMeter` — derives pairs/s and propagation GFLOP/s from
  epoch wall time and the model's static work estimate
  (2·nnz·d FLOPs per sparse application — SURVEY §7.4; the dense
  backend's MXU work is 2·U_pad·I_pad·d per direction, reported as
  `mxu_gflops` so roofline math is possible from the logs alone);
* `debug_options` — applies `jax_debug_nans` / deterministic flags
  from config (the race-detection analogue for a JAX stack).
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass

import jax


@contextlib.contextmanager
def maybe_trace(profile_dir: str | None):
    """jax.profiler trace when a directory is given, no-op otherwise."""
    if not profile_dir:
        yield
        return
    with jax.profiler.trace(profile_dir):
        yield


def debug_options(config) -> None:
    """Apply run-debug flags from config:

    debug_nans = 1      -> jax_debug_nans (fail fast on NaN outputs)
    """
    if config.int("debug_nans", 0) == 1:
        jax.config.update("jax_debug_nans", True)


@dataclass
class ThroughputMeter:
    """Static per-epoch work model; turns epoch seconds into rates."""

    num_train: int          # BPR triples per epoch
    nnz: int                # interaction count (edges; x2 for symmetric Â)
    emb_size: int
    num_layers: int
    steps_per_epoch: int
    aggregates_per_step: int = 1  # SimGCL=3, SGL=3, ...
    dense_dims: tuple[int, int] | None = None  # padded (U, I) if dense backend

    @property
    def sparse_flops_per_epoch(self) -> float:
        """Algorithmic sparse FLOPs: fwd+bwd per layer, both directions
        (2·nnz rows each way), 2 FLOPs per multiply-add."""
        per_app = 2.0 * (2 * self.nnz) * self.emb_size
        apps = 2 * self.num_layers * self.aggregates_per_step * self.steps_per_epoch
        return per_app * apps

    @property
    def mxu_flops_per_epoch(self) -> float:
        """Actual MXU FLOPs when the dense backend runs (0 otherwise)."""
        if self.dense_dims is None:
            return 0.0
        u, i = self.dense_dims
        per_app = 2.0 * u * i * self.emb_size * 2  # both directions
        apps = 2 * self.num_layers * self.aggregates_per_step * self.steps_per_epoch
        return per_app * apps

    def rates(self, epoch_seconds: float) -> dict[str, float]:
        s = max(epoch_seconds, 1e-9)
        return {
            "pairs_per_sec": self.num_train / s,
            "sparse_gflops": self.sparse_flops_per_epoch / s / 1e9,
            "mxu_gflops": self.mxu_flops_per_epoch / s / 1e9,
        }
