"""Multi-host (multi-process) runtime initialization.

One TPU pod slice = N hosts × M chips; JAX needs
`jax.distributed.initialize` called once per host process before any
device use so all chips join one global runtime (ICI within a slice,
DCN across hosts). The reference has no equivalent (single process,
single GPU — SURVEY §5); this is the framework's entry point for pod
runs:

    from idgrec_tpu.parallel.distributed import initialize
    initialize()                       # TPU pod: auto-detected env
    mesh = make_mesh()                 # now spans every chip via jax.devices()

On Cloud TPU the coordinator address / process counts come from the
TPU metadata environment, so bare `initialize()` suffices; explicit
arguments are for DCN clusters without that metadata. Training code is
unchanged — `train_model(..., mesh=make_mesh())` shards over whatever
`jax.devices()` reports, and every host->device placement goes through
`parallel.mesh.global_put`, under which each host materializes only
its addressable shards of the global arrays (validated end-to-end by
tests/test_multihost.py's real 2-process CPU cluster).
"""

from __future__ import annotations

import jax

_initialized: str | None = None  # None | "local" | "cluster"


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Idempotent `jax.distributed.initialize` wrapper.

    No-op when the cluster runtime is already joined, or when
    autodetection finds no cluster metadata (single-process). An
    EXPLICIT call after a local fallback still attempts the join — a
    silent no-op there would leave the peer hosts blocked forever."""
    global _initialized
    if _initialized == "cluster":
        return
    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
    )
    if _initialized == "local" and not explicit:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError) as e:
        # Autodetection failures come in two benign shapes:
        # * ValueError — argument validation: no cluster metadata was
        #   found in the environment (classified by TYPE, not by the
        #   wording of a JAX-internal message, which has no stability
        #   guarantee across upgrades);
        # * RuntimeError "must be called before ..." — the local
        #   backend was already touched. On a single machine degrading
        #   to single-process is correct; on a real pod it would NOT
        #   be, so it's logged loudly below.
        already_up = isinstance(e, RuntimeError) and "before" in str(e)
        benign = isinstance(e, ValueError) or already_up
        if explicit or not benign:
            # the caller named a cluster, or metadata WAS detected and
            # the join genuinely failed (e.g. a barrier timeout):
            # silently degrading to N independent single-process runs
            # (every host claiming process_index 0, fighting over
            # logs/checkpoints while collectives hang) is the one
            # unacceptable outcome
            raise
        if already_up:
            import logging

            logging.getLogger("idgrec_tpu").warning(
                "jax.distributed.initialize was skipped because the "
                "backend is already initialized (%s) — if this is a "
                "multi-host run, call initialize() before any device "
                "use or collectives will hang", e,
            )
        _initialized = "local"
        return
    _initialized = "cluster"


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the host that owns run-wide side effects (log files,
    checkpoints, stdout). Mirrors the single-writer convention of
    multi-host JAX programs; always True single-process."""
    return jax.process_index() == 0


# NOTE: an earlier design had a `host_shard(n) -> slice` helper for
# per-host slicing of the epoch sample stream. It was superseded by
# `parallel.mesh.global_put`: sampling is on-device and deterministic
# in the shared PRNG key, so every host holds the same (cheap) host
# copy and the placement callback slices out only the addressable
# shards — no cross-host coordination of stream offsets needed.
