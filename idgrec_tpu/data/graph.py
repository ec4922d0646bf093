"""Normalized sparse graph construction, TPU-ready.

Builds the three adjacency normalizations of the reference
(utility/utility_data/data_graph.py:7,33,58) plus the generalized
``D^-alpha A D^-beta`` form of LightGCN++ (models/LightGCN_pp.py:42-73),
directly from the Dataset CSR with vectorized numpy (no scipy dok/lil
round trips), and represents the result as `SparseGraph`: padded COO
arrays sorted by destination row, with the transpose ordering carried
alongside so the SpMM backward pass is a forward SpMM on pre-sorted
arrays.

Normalization cache: results are stored as ``.npz`` beside the dataset
(same idea as the reference's ``pre_A*.npz`` caches, data_graph.py:9,27)
under ``<path>/tpu_cache/``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from idgrec_tpu.data.dataset import Dataset

_PAD_MULTIPLE = 1024


def _register_pytree() -> None:
    """Register SparseGraph as a JAX pytree so a whole graph can be
    device_put once and passed through jit boundaries."""
    import jax.tree_util as jtu

    jtu.register_dataclass(
        SparseGraph,
        data_fields=["rows", "cols", "vals", "t_rows", "t_cols", "t_vals"],
        meta_fields=["n_rows", "n_cols", "nnz", "symmetric"],
    )


def _pad_to(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


@dataclass(frozen=True)
class SparseGraph:
    """A sparse matrix in row-sorted COO with its transpose ordering.

    ``rows`` is non-decreasing; padding entries have ``val == 0`` and
    point at the LAST row/col index (keeps ``rows`` sorted) — harmless
    for segment-sum SpMM because the value is zero.
    All index arrays are int32 and values float32 (cast at use site).
    """

    rows: np.ndarray  # int32 [nnz_padded], sorted ascending
    cols: np.ndarray  # int32 [nnz_padded]
    vals: np.ndarray  # float32 [nnz_padded]
    t_rows: np.ndarray  # transpose, sorted by (transposed) row
    t_cols: np.ndarray
    t_vals: np.ndarray
    n_rows: int
    n_cols: int
    nnz: int  # true (unpadded) edge count
    symmetric: bool = False

    @property
    def shape(self) -> tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @classmethod
    def from_coo(
        cls,
        rows: np.ndarray,
        cols: np.ndarray,
        vals: np.ndarray,
        shape: tuple[int, int],
        symmetric: bool = False,
        pad_multiple: int = _PAD_MULTIPLE,
    ) -> "SparseGraph":
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        vals = np.asarray(vals, dtype=np.float32)
        nnz = int(rows.size)

        order = np.lexsort((cols, rows))
        r = rows[order]
        c = cols[order]
        v = vals[order]

        padded = _pad_to(max(nnz, 1), pad_multiple)
        pad = padded - nnz

        def _padded(a: np.ndarray, dtype, fill) -> np.ndarray:
            # Padding rows use the LAST row index so the row array stays
            # non-decreasing (segment-sum relies on sorted segment ids);
            # padding values are 0 so they contribute nothing.
            return np.concatenate([a, np.full(pad, fill, dtype=a.dtype)]).astype(dtype)

        if symmetric:
            tr, tc, tv = r, c, v
        else:
            t_order = np.lexsort((rows, cols))
            tr, tc, tv = cols[t_order], rows[t_order], vals[t_order]

        return cls(
            rows=_padded(r, np.int32, shape[0] - 1),
            cols=_padded(c, np.int32, shape[1] - 1),
            vals=_padded(v, np.float32, 0.0),
            t_rows=_padded(tr, np.int32, shape[1] - 1),
            t_cols=_padded(tc, np.int32, shape[0] - 1),
            t_vals=_padded(tv, np.float32, 0.0),
            n_rows=int(shape[0]),
            n_cols=int(shape[1]),
            nnz=nnz,
            symmetric=symmetric,
        )

    def transpose(self) -> "SparseGraph":
        return SparseGraph(
            rows=self.t_rows,
            cols=self.t_cols,
            vals=self.t_vals,
            t_rows=self.rows,
            t_cols=self.cols,
            t_vals=self.vals,
            n_rows=self.n_cols,
            n_cols=self.n_rows,
            nnz=self.nnz,
            symmetric=self.symmetric,
        )

    def to_scipy(self):
        import scipy.sparse as sp

        n = self.nnz
        return sp.coo_matrix(
            (self.vals[:n], (self.rows[:n], self.cols[:n])), shape=self.shape
        ).tocsr()

    # -- (de)serialization for the preprocessing cache --------------------
    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            rows=self.rows[: self.nnz],
            cols=self.cols[: self.nnz],
            vals=self.vals[: self.nnz],
            shape=np.array(self.shape, dtype=np.int64),
            symmetric=np.array(self.symmetric),
        )

    @classmethod
    def load(cls, path: str) -> "SparseGraph":
        with np.load(path) as z:
            return cls.from_coo(
                z["rows"], z["cols"], z["vals"], tuple(z["shape"]), bool(z["symmetric"])
            )


_register_pytree()


# ---------------------------------------------------------------------------
# Edge extraction and degree math


def _interaction_edges(data: Dataset) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unique (user, item, multiplicity) training pairs from the CSR."""
    users = np.repeat(
        np.arange(data.num_users, dtype=np.int64), np.diff(data.row_ptr)
    )
    return users, data.col_idx.astype(np.int64), data.csr_vals.astype(np.float64)


def _degrees(data: Dataset) -> tuple[np.ndarray, np.ndarray]:
    """(user degree, item degree) including interaction multiplicities
    — matching the scipy row/col sums the reference normalizes with
    (data_graph.py:46-49)."""
    u, i, v = _interaction_edges(data)
    du = np.bincount(u, weights=v, minlength=data.num_users)
    di = np.bincount(i, weights=v, minlength=data.num_items)
    return du, di


def _inv_pow(x: np.ndarray, p: float) -> np.ndarray:
    with np.errstate(divide="ignore"):
        out = np.power(x, -p)
    out[~np.isfinite(out)] = 0.0
    return out


def _cache_path(data: Dataset, key: str) -> str | None:
    if not data.path or not os.path.isdir(data.path):
        return None
    cache_dir = os.path.join(data.path, "tpu_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return None
    return os.path.join(cache_dir, f"{key}.npz")


def _cached(data: Dataset, key: str, build):
    path = _cache_path(data, key)
    if path and os.path.exists(path):
        return SparseGraph.load(path)
    graph = build()
    if path:
        try:
            graph.save(path)
        except OSError:
            pass
    return graph


# ---------------------------------------------------------------------------
# Public builders


def normalized_adjacency(data: Dataset, cache: bool = True) -> SparseGraph:
    """Symmetric normalization of the bipartite adjacency (no self-loop):
    ``Ã = D^-1/2 · A · D^-1/2`` with ``A = [[0, R], [Rᵀ, 0]]``
    (reference data_graph.py:33-55; cached as pre_A.npz)."""

    def build() -> SparseGraph:
        u, i, v = _interaction_edges(data)
        du, di = _degrees(data)
        nu = data.num_users
        w = v * _inv_pow(du, 0.5)[u] * _inv_pow(di, 0.5)[i]
        rows = np.concatenate([u, i + nu])
        cols = np.concatenate([i + nu, u])
        vals = np.concatenate([w, w]).astype(np.float32)
        return SparseGraph.from_coo(
            rows, cols, vals, (data.num_nodes, data.num_nodes), symmetric=True
        )

    return _cached(data, "pre_A", build) if cache else build()


def normalized_adjacency_with_self(data: Dataset, cache: bool = True) -> SparseGraph:
    """Symmetric normalization of ``A + I``
    (reference data_graph.py:7-30; cached as pre_A_with_self.npz)."""

    def build() -> SparseGraph:
        u, i, v = _interaction_edges(data)
        du, di = _degrees(data)
        nu, nn = data.num_users, data.num_nodes
        d = np.concatenate([du, di]) + 1.0  # self-loop adds 1 to every degree
        dinv = _inv_pow(d, 0.5)
        w = v * dinv[u] * dinv[i + nu]
        diag = dinv[np.arange(nn)] ** 2  # 1/d for the self edge
        rows = np.concatenate([u, i + nu, np.arange(nn)])
        cols = np.concatenate([i + nu, u, np.arange(nn)])
        vals = np.concatenate([w, w, diag]).astype(np.float32)
        return SparseGraph.from_coo(rows, cols, vals, (nn, nn), symmetric=True)

    return _cached(data, "pre_A_with_self", build) if cache else build()


def normalized_rectangular(data: Dataset, cache: bool = True) -> SparseGraph:
    """Rectangular normalization ``R̃ = Du^-1/2 · R · Di^-1/2``
    (reference data_graph.py:58-79; cached as pre_R.npz)."""

    def build() -> SparseGraph:
        u, i, v = _interaction_edges(data)
        du, di = _degrees(data)
        w = (v * _inv_pow(du, 0.5)[u] * _inv_pow(di, 0.5)[i]).astype(np.float32)
        return SparseGraph.from_coo(u, i, w, (data.num_users, data.num_items))

    return _cached(data, "pre_R", build) if cache else build()


def generalized_normalized_adjacency(
    data: Dataset, alpha: float, beta: float, cache: bool = True
) -> SparseGraph:
    """Generalized norm ``Ã = D^-alpha · A · D^-beta`` (no self-loop),
    the LightGCN++ graph (models/LightGCN_pp.py:42-73). Not symmetric as
    a matrix unless alpha == beta."""

    def build() -> SparseGraph:
        u, i, v = _interaction_edges(data)
        du, di = _degrees(data)
        nu = data.num_users
        d = np.concatenate([du, di])
        d_left = _inv_pow(d, alpha)
        d_right = _inv_pow(d, beta)
        w_ui = v * d_left[u] * d_right[i + nu]
        w_iu = v * d_left[i + nu] * d_right[u]
        rows = np.concatenate([u, i + nu])
        cols = np.concatenate([i + nu, u])
        vals = np.concatenate([w_ui, w_iu]).astype(np.float32)
        return SparseGraph.from_coo(
            rows, cols, vals, (data.num_nodes, data.num_nodes), symmetric=(alpha == beta)
        )

    key = f"pre_A_{alpha}_{beta}"
    return _cached(data, key, build) if cache else build()


def edge_dropout_adjacency(
    data: Dataset, drop_ratio: float, rng: np.random.Generator
) -> SparseGraph:
    """SGL-style augmentation: keep ``(1-ratio)·E`` interaction edges
    (sampled without replacement) and renormalize symmetrically
    (reference tools.py:67-92 ``create_adj_mat`` with aug 'ed'/'rw').

    Degrees are recomputed on the subsampled graph, as in the reference.
    """
    u_all, i_all, v_all = _interaction_edges(data)
    nnz = u_all.size
    # permutation split (shared convention with the dense backend so the
    # same np rng state selects the same kept edges on either backend)
    keep = rng.permutation(nnz)[: int(round((1.0 - drop_ratio) * nnz))]
    u = u_all[keep]
    i = i_all[keep]
    # binary edge values, matching the reference augmentation
    # (tools.py:80 builds the subgraph with np.ones)
    v = np.ones(keep.size, dtype=np.float64)
    # per-epoch hot path (SGL rebuilds 2 subgraphs every epoch):
    # bincount beats np.add.at by >10x at this scale
    du = np.bincount(u, minlength=data.num_users).astype(np.float64)
    di = np.bincount(i, minlength=data.num_items).astype(np.float64)
    w = (v * _inv_pow(du, 0.5)[u] * _inv_pow(di, 0.5)[i]).astype(np.float32)
    nu = data.num_users
    rows = np.concatenate([u, i + nu])
    cols = np.concatenate([i + nu, u])
    vals = np.concatenate([w, w])
    # pad to the full graph's padded size so jit shapes stay static across epochs
    full_padded = _pad_to(max(2 * nnz, 1), _PAD_MULTIPLE)
    return SparseGraph.from_coo(
        rows, cols, vals, (data.num_nodes, data.num_nodes), symmetric=True,
        pad_multiple=full_padded,
    )
