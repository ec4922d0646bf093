"""Sparse matrix @ dense matrix (SpMM) for TPU.

This is the hot kernel of every GCN-style model: ``Ã · E`` with ``Ã``
the normalized adjacency and ``E`` the [num_nodes, dim] embedding stack
(the reference runs it as ``torch.sparse.mm`` per layer,
models/LightGCN.py:43-45).

TPU-native formulation: the edge list is stored row-sorted COO
(`SparseGraph`), so propagation is one gather of source rows, a scale
by edge weights, and one sorted segment-sum into destination rows —
an HBM-bandwidth-bound pattern XLA lowers well on TPU. A custom VJP
maps the backward pass onto the *pre-sorted transpose* edge arrays, so
the gradient is the same sorted-segment-sum kernel (deterministic, no
unsorted scatter), and for symmetric adjacencies it reuses the very
same index arrays (Âᵀ = Â).

Accumulation is always float32 even when embeddings flow in bfloat16.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.data.graph import SparseGraph


def _segment_spmm(
    n_rows: int,
    rows: jnp.ndarray,
    cols: jnp.ndarray,
    vals: jnp.ndarray,
    x: jnp.ndarray,
) -> jnp.ndarray:
    """y[r] = sum_{edges (r, c, v)} v * x[c], accumulated in f32."""
    gathered = jnp.take(x, cols, axis=0).astype(jnp.float32)
    weighted = gathered * vals[:, None]
    y = jax.ops.segment_sum(
        weighted, rows, num_segments=n_rows, indices_are_sorted=True
    )
    return y.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _spmm(n_rows, n_cols, rows, cols, vals, t_rows, t_cols, t_vals, x):
    return _segment_spmm(n_rows, rows, cols, vals, x)


def _spmm_fwd(n_rows, n_cols, rows, cols, vals, t_rows, t_cols, t_vals, x):
    y = _segment_spmm(n_rows, rows, cols, vals, x)
    return y, (t_rows, t_cols, t_vals)


def _spmm_bwd(n_rows, n_cols, residuals, g):
    t_rows, t_cols, t_vals = residuals
    dx = _segment_spmm(n_cols, t_rows, t_cols, t_vals, g)
    float0 = np.zeros(t_rows.shape, dtype=jax.dtypes.float0)
    zero_vals = jnp.zeros(t_vals.shape, dtype=jnp.float32)
    return (float0, float0, zero_vals, float0, float0, zero_vals, dx)


_spmm.defvjp(_spmm_fwd, _spmm_bwd)


def spmm(graph: SparseGraph, x: jnp.ndarray) -> jnp.ndarray:
    """``graph @ x`` — propagate embeddings along the sparse graph.

    graph: SparseGraph of logical shape [n_rows, n_cols]
    x:     [n_cols, dim] dense matrix
    returns [n_rows, dim] in x.dtype (f32 accumulation internally).

    Differentiable in ``x``; the graph is treated as a constant
    (its cotangent is zero — adjacency is never trained here).
    """
    if x.shape[0] != graph.n_cols:
        raise ValueError(
            f"spmm shape mismatch: graph {graph.shape} @ x {x.shape}"
        )
    # explicit-collective path when traced under an active model-axis
    # mesh (parallel/spmm_shard.py): per-chip edge reads/storage are
    # 1/N, one all_gather + one psum_scatter of activations per
    # application — the sharding story for graphs too big for the
    # dense backend's budget (the regime that needs multi-chip most)
    from idgrec_tpu.parallel import spmm_shard

    y = spmm_shard.maybe_sharded_spmm(graph, x)
    if y is not None:
        return y
    return _spmm(
        graph.n_rows,
        graph.n_cols,
        graph.rows,
        graph.cols,
        graph.vals,
        graph.t_rows,
        graph.t_cols,
        graph.t_vals,
        x,
    )


def spmm_transpose(graph: SparseGraph, x: jnp.ndarray) -> jnp.ndarray:
    """``graphᵀ @ x`` without materializing a transposed graph."""
    return spmm(graph.transpose(), x)
