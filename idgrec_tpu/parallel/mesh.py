"""Device mesh and sharding layout.

The reference is strictly single-process, single-GPU (SURVEY §2.1:
"Parallelism strategies present in the reference: NONE"), so this
subsystem is new capability, designed per the scaling north star:

* mesh axes ``("data", "model")`` — data-parallel batch sharding over
  ``data``; embedding-table rows (the node dimension, this workload's
  analogue of the sequence axis) sharded over ``model``;
* losses/gradients reduce over ``data`` with psum (inserted by XLA
  from sharding constraints under jit);
* propagation runs through the explicit shard_map + collectives path
  (parallel/spmm_shard.py): adjacency row-sharded over ``model``, one
  all_gather of activation shards + one psum_scatter per application,
  riding ICI; the single-chip Pallas kernels run unchanged per shard.

All helpers are usable both on real multi-chip platforms and on the
CPU fake backend (``--xla_force_host_platform_device_count=N``).
"""

from __future__ import annotations

import math
from contextlib import contextmanager

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# ---------------------------------------------------------------------------
# Active-mesh context: the engine (trainer/evaluator) sets this while
# TRACING its jitted step/sweep so the propagation backends
# (ops/propagate.py) can route square-adjacency applications through the
# explicit shard_map + collectives path (parallel/spmm_shard.py) instead
# of leaving the partitioning to GSPMD. Trace-time only — never read
# inside traced control flow.

_ACTIVE_MESH: Mesh | None = None


def get_active_mesh() -> Mesh | None:
    return _ACTIVE_MESH


@contextmanager
def use_mesh(mesh: Mesh | None):
    """Bind `mesh` as the active mesh for the duration (no-op if None)."""
    global _ACTIVE_MESH
    prev = _ACTIVE_MESH
    _ACTIVE_MESH = mesh
    try:
        yield
    finally:
        _ACTIVE_MESH = prev


def make_mesh(
    n_devices: int | None = None,
    data_parallel: int | None = None,
    devices: list | None = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the first n devices.

    By default the data axis gets the largest power-of-two factor ≤
    sqrt(n) so both axes are populated when possible.
    """
    devices = devices if devices is not None else jax.devices()
    n = n_devices if n_devices is not None else len(devices)
    devices = devices[:n]
    if data_parallel is None:
        # non-power-of-two counts break the sharding stack's contracts
        # (parallel/padding.py pads rows to 128-multiples, shardable on
        # 'any power-of-two model axis'; batch sizes are powers of two
        # for the data axis) — use the largest power-of-two subset
        n2 = 1 << (n.bit_length() - 1)
        if n2 != n:
            import logging

            logging.getLogger("idgrec_tpu").warning(
                "device count %d is not a power of two — using %d "
                "devices (the sharding layout needs power-of-two axes)",
                n, n2,
            )
            n = n2
            devices = devices[:n]
        data_parallel = 1
        while data_parallel * 2 <= math.isqrt(n) and n % (data_parallel * 2) == 0:
            data_parallel *= 2
    elif data_parallel <= 0 or n % data_parallel != 0:
        raise ValueError(
            f"data_parallel={data_parallel} must be positive and divide "
            f"the device count ({n})"
        )
    model_parallel = n // data_parallel
    if model_parallel & (model_parallel - 1):
        # explicit data_parallel left a non-power-of-two model axis:
        # tables would silently replicate (padding contract) and
        # spmm_shard would fall back single-chip — shrink to the
        # largest power-of-two divisor instead of a no-op sharding
        pow2 = 1 << (model_parallel.bit_length() - 1)
        import logging

        logging.getLogger("idgrec_tpu").warning(
            "model axis %d is not a power of two — tables would "
            "replicate (parallel/padding.py contract); using %d of the "
            "%d devices (mesh %dx%d)",
            model_parallel, data_parallel * pow2, n, data_parallel, pow2,
        )
        model_parallel = pow2
        devices = devices[: data_parallel * model_parallel]
    mesh_devices = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(mesh_devices, axis_names=("data", "model"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def global_put(tree, shardings):
    """Multi-process-safe ``jax.device_put``.

    Single-process: plain device_put. Multi-process (pod runs,
    ``jax.distributed``): ``device_put`` cannot place onto shardings
    spanning non-addressable devices, so global jax.Arrays are
    assembled from the per-host data via
    ``jax.make_array_from_callback`` — each host materializes ONLY its
    addressable shards (the callback slices the host copy), which is
    what makes per-host feeding scale: the host never touches remote
    shards' bytes. Requires the host data to be identical on every
    process (true for the engine: sampling/init are deterministic in
    the shared PRNG key)."""
    multi = jax.process_count() > 1

    def place(x, s):
        if isinstance(x, jax.Array) and x.sharding == s:
            # already placed exactly as requested (e.g. SGL's shared
            # binary matrix, mesh-placed once with the model constants
            # but embedded in every epoch's context pytree): re-placing
            # would copy gigabytes across the mesh every epoch
            return x
        if not multi:
            return jax.device_put(x, s)
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            # a global array with a DIFFERENT sharding (e.g. epoch-
            # context leaves derived from sharded params, NCL's k-means
            # outputs): np.asarray would raise on non-addressable
            # shards — reshard on device via a jitted identity (XLA
            # inserts the collectives)
            return _identity_restage(s)(x)
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, s, lambda idx: arr[idx])

    return jax.tree.map(place, tree, shardings)


_RESTAGE_CACHE: dict = {}


def _identity_restage(sharding):
    """Memoized jitted identity per target sharding — a fresh
    ``jax.jit(lambda a: a, ...)`` per call would defeat the jit cache
    (keyed on the function object) and re-lower every epoch."""
    fn = _RESTAGE_CACHE.get(sharding)
    if fn is None:
        fn = jax.jit(lambda a: a, out_shardings=sharding)
        _RESTAGE_CACHE[sharding] = fn
    return fn


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """1-D per-sample arrays sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def param_shardings(params, mesh: Mesh):
    """Row-shard embedding-like [N, d] tables over the model axis;
    replicate small/odd-shaped leaves.

    Rows must divide the model-axis size (`jax.device_put` rejects
    uneven NamedShardings outright). Real-world row counts (yelp2018's
    31,668/38,048 — reference models/LightGCN.py:21-24) get there via
    the engine's padded-storage layer (parallel/padding.py): every
    large [N, d] training-state leaf is zero-padded to a 128-row
    multiple BEFORE placement, so divisibility holds for any
    power-of-two model axis ≤ 128, matching the adjacency padding in
    ops/propagate.py. The divisibility check here is the safety net
    for never-padded odd leaves, which simply replicate.
    """
    model_size = mesh.shape["model"]

    def spec(x):
        if (hasattr(x, "ndim") and x.ndim == 2
                and x.shape[0] >= 2 * model_size
                and x.shape[0] % model_size == 0):
            return NamedSharding(mesh, P("model", None))
        if (hasattr(x, "ndim") and x.ndim == 1
                and x.shape[0] >= (1 << 20)
                and x.shape[0] % model_size == 0):
            # huge 1-D leaves are sparse-graph edge arrays (COO
            # rows/cols/vals, ≥1024-padded — data/graph.py): chunk
            # them over 'model' so per-chip edge storage is 1/N,
            # matching the sharded gather kernel's edge partition
            # (parallel/spmm_shard.maybe_sharded_spmm). Node-scale
            # vectors (degree scales etc.) stay replicated below the
            # 1M threshold.
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)
