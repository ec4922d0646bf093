"""Device mesh and sharding layout.

The reference is strictly single-process, single-GPU (SURVEY §2.1:
"Parallelism strategies present in the reference: NONE"), so this
subsystem is new capability, designed per the scaling north star:

* mesh axes ``("data", "model")`` — data-parallel batch sharding over
  ``data``; embedding-table rows (the node dimension, this workload's
  analogue of the sequence axis) sharded over ``model``;
* losses/gradients reduce over ``data`` with psum (inserted by XLA
  from sharding constraints under jit);
* propagation consumes the full node table — XLA inserts the
  all-gather over ``model`` along ICI (an explicit edge-partitioned
  shard_map kernel is the planned optimization, see parallel/spmm_shard).

All helpers are usable both on real multi-chip platforms and on the
CPU fake backend (``--xla_force_host_platform_device_count=N``).
"""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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
        data_parallel = 1
        while data_parallel * 2 <= math.isqrt(n) and n % (data_parallel * 2) == 0:
            data_parallel *= 2
        if n % data_parallel != 0:
            data_parallel = 1
    model_parallel = n // data_parallel
    mesh_devices = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(mesh_devices, axis_names=("data", "model"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """1-D per-sample arrays sharded over the data axis."""
    return NamedSharding(mesh, P("data"))


def param_shardings(params, mesh: Mesh):
    """Row-shard embedding-like [N, d] tables over the model axis;
    replicate small/odd-shaped leaves.

    Rows must divide the model-axis size (jax.device_put rejects uneven
    NamedShardings). The heavy arrays are built divisible on purpose:
    the propagation backends zero-pad the interaction matrix to
    128-row multiples (ops/propagate.py), which is what makes
    multi-chip propagation read 1/model_size of the matrix per chip
    for any model-axis size up to 128. Embedding tables shard when
    their row count divides; otherwise they replicate (8 MB at
    yelp2018 scale — gradient reduction handles them either way).
    """
    model_size = mesh.shape["model"]

    def spec(x):
        if (hasattr(x, "ndim") and x.ndim == 2
                and x.shape[0] >= 2 * model_size
                and x.shape[0] % model_size == 0):
            return NamedSharding(mesh, P("model", None))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)
