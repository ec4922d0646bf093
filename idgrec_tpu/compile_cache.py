"""Persistent XLA compilation cache.

Compiles of the whole-epoch program can take minutes when compilation
is serviced remotely (networked TPU transports); the persistent cache
makes every re-run after the first start in seconds. Enabled by the
CLI, `bench.py`, and the driver entry points; library users call
`enable()` themselves if they want it.

Env overrides: ``IDGREC_CACHE_DIR`` sets the directory,
``IDGREC_NO_COMPILE_CACHE=1`` disables.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "idgrec_tpu", "xla"
)


def enable(cache_dir: str | None = None) -> str | None:
    """Idempotently enable the persistent compilation cache."""
    if os.environ.get("IDGREC_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    if jax.default_backend() not in ("tpu", "axon"):
        # CPU AOT artifacts are machine-feature-pinned; reloading one
        # compiled elsewhere can SIGILL — only cache device programs
        return None
    path = cache_dir or os.environ.get("IDGREC_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that took real time to build
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
