import numpy as np
import scipy.sparse as sp

from idgrec_tpu.data.graph import (
    SparseGraph,
    edge_dropout_adjacency,
    generalized_normalized_adjacency,
    normalized_adjacency,
    normalized_adjacency_with_self,
    normalized_rectangular,
)


def _reference_sym_norm(R: sp.csr_matrix, with_self: bool) -> sp.csr_matrix:
    """Independent scipy recomputation of the reference normalization
    (data_graph.py:33-55 / 7-30)."""
    nu, ni = R.shape
    A = sp.bmat([[None, R], [R.T, None]], format="csr").astype(np.float64)
    if with_self:
        A = A + sp.eye(nu + ni)
    d = np.asarray(A.sum(axis=1)).flatten()
    dinv = np.power(d, -0.5, where=d > 0)
    dinv[d == 0] = 0.0
    D = sp.diags(dinv)
    return (D @ A @ D).tocsr()


def test_normalized_adjacency_matches_scipy(tiny_dataset):
    g = normalized_adjacency(tiny_dataset, cache=False)
    ours = g.to_scipy().astype(np.float64)
    ref = _reference_sym_norm(tiny_dataset.to_scipy_csr(), with_self=False)
    assert np.allclose(ours.toarray(), ref.toarray(), atol=1e-6)


def test_normalized_adjacency_with_self_matches_scipy(tiny_dataset):
    g = normalized_adjacency_with_self(tiny_dataset, cache=False)
    ref = _reference_sym_norm(tiny_dataset.to_scipy_csr(), with_self=True)
    assert np.allclose(g.to_scipy().toarray(), ref.toarray(), atol=1e-6)


def test_normalized_rectangular_matches_scipy(tiny_dataset):
    g = normalized_rectangular(tiny_dataset, cache=False)
    R = tiny_dataset.to_scipy_csr().astype(np.float64)
    du = np.asarray(R.sum(axis=1)).flatten()
    di = np.asarray(R.sum(axis=0)).flatten()

    def inv_sqrt(x):
        out = np.power(x, -0.5, where=x > 0)
        out[x == 0] = 0
        return out

    ref = sp.diags(inv_sqrt(du)) @ R @ sp.diags(inv_sqrt(di))
    assert np.allclose(g.to_scipy().toarray(), ref.toarray(), atol=1e-6)


def test_generalized_adjacency(tiny_dataset):
    alpha, beta = 0.6, -0.1
    g = generalized_normalized_adjacency(tiny_dataset, alpha, beta, cache=False)
    R = tiny_dataset.to_scipy_csr().astype(np.float64)
    nu, ni = R.shape
    A = sp.bmat([[None, R], [R.T, None]], format="csr").astype(np.float64)
    d = np.asarray(A.sum(axis=1)).flatten()

    def inv_pow(x, p):
        out = np.power(x, -p, where=x > 0)
        out[x == 0] = 0
        return out

    ref = sp.diags(inv_pow(d, alpha)) @ A @ sp.diags(inv_pow(d, beta))
    assert np.allclose(g.to_scipy().toarray(), ref.toarray(), atol=1e-6)


def test_rows_sorted_and_padded(tiny_dataset):
    g = normalized_adjacency(tiny_dataset, cache=False)
    assert (np.diff(g.rows) >= 0).all()
    assert (np.diff(g.t_rows) >= 0).all()
    assert g.rows.size % 1024 == 0
    assert np.all(g.vals[g.nnz :] == 0)
    # padded indices point at the last row (keeps sortedness)
    assert np.all(g.rows[g.nnz :] == g.n_rows - 1)


def test_transpose_roundtrip(tiny_dataset):
    g = normalized_rectangular(tiny_dataset, cache=False)
    gt = g.transpose()
    assert gt.shape == (g.n_cols, g.n_rows)
    assert np.allclose(gt.to_scipy().toarray(), g.to_scipy().toarray().T)


def test_cache_roundtrip(tiny_dataset):
    g1 = normalized_adjacency(tiny_dataset, cache=True)
    g2 = normalized_adjacency(tiny_dataset, cache=True)  # loads from cache
    assert np.allclose(g1.to_scipy().toarray(), g2.to_scipy().toarray())


def test_edge_dropout(tiny_dataset):
    rng = np.random.default_rng(0)
    full = normalized_adjacency(tiny_dataset, cache=False)
    g = edge_dropout_adjacency(tiny_dataset, 0.3, rng)
    # same padded buffer length as the full graph -> stable jit shapes
    assert g.rows.size == full.rows.size
    kept_edges = g.nnz // 2
    assert kept_edges == int(round(0.7 * tiny_dataset.nnz))
    # still symmetric and normalized
    M = g.to_scipy().toarray()
    assert np.allclose(M, M.T, atol=1e-6)
