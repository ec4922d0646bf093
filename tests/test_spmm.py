import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.data.graph import SparseGraph, normalized_adjacency, normalized_rectangular
from idgrec_tpu.ops.spmm import spmm, spmm_transpose


def _random_graph(rng, n_rows, n_cols, nnz, symmetric=False):
    rows = rng.integers(0, n_rows, nnz)
    cols = rng.integers(0, n_cols, nnz)
    vals = rng.normal(size=nnz).astype(np.float32)
    if symmetric:
        rows, cols = np.concatenate([rows, cols]), np.concatenate([cols, rows])
        vals = np.concatenate([vals, vals])
    return SparseGraph.from_coo(rows, cols, vals, (n_rows, n_cols), symmetric=symmetric)


def test_spmm_matches_dense(rng):
    g = _random_graph(rng, 17, 23, 50)
    x = rng.normal(size=(23, 8)).astype(np.float32)
    y = spmm(g, jnp.asarray(x))
    dense = g.to_scipy().toarray()
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-5, atol=1e-5)


def test_spmm_symmetric_square(rng):
    g = _random_graph(rng, 20, 20, 60, symmetric=True)
    x = rng.normal(size=(20, 4)).astype(np.float32)
    y = spmm(g, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), g.to_scipy().toarray() @ x, rtol=1e-5, atol=1e-5)


def test_spmm_transpose(rng):
    g = _random_graph(rng, 9, 13, 30)
    x = rng.normal(size=(9, 5)).astype(np.float32)
    y = spmm_transpose(g, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y), g.to_scipy().toarray().T @ x, rtol=1e-5, atol=1e-5
    )


def test_spmm_gradient_matches_dense(rng):
    g = _random_graph(rng, 11, 7, 25)
    x = rng.normal(size=(7, 3)).astype(np.float32)
    w = rng.normal(size=(11, 3)).astype(np.float32)

    def loss(x):
        return jnp.sum(spmm(g, x) * w)

    dx = jax.grad(loss)(jnp.asarray(x))
    dense = g.to_scipy().toarray()
    np.testing.assert_allclose(np.asarray(dx), dense.T @ w, rtol=1e-5, atol=1e-5)


def test_spmm_gradient_through_layers(rng):
    """Gradient through K stacked propagations (the LightGCN pattern)."""
    g = _random_graph(rng, 12, 12, 40, symmetric=True)
    x = rng.normal(size=(12, 4)).astype(np.float32)
    dense = g.to_scipy().toarray()

    def f(x):
        h = x
        acc = x
        for _ in range(3):
            h = spmm(g, h)
            acc = acc + h
        return jnp.sum(acc**2)

    def f_dense(x):
        h = x
        acc = x
        for _ in range(3):
            h = jnp.asarray(dense) @ h
            acc = acc + h
        return jnp.sum(acc**2)

    g1 = jax.grad(f)(jnp.asarray(x))
    g2 = jax.grad(f_dense)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-4)


def test_spmm_under_jit(tiny_dataset, rng):
    g = normalized_adjacency(tiny_dataset, cache=False)
    g_dev = jax.device_put(g)
    x = jnp.asarray(rng.normal(size=(g.n_cols, 6)).astype(np.float32))

    @jax.jit
    def run(graph, x):
        return spmm(graph, x)

    y = run(g_dev, x)
    np.testing.assert_allclose(
        np.asarray(y), g.to_scipy().toarray() @ np.asarray(x), rtol=1e-5, atol=1e-5
    )


def test_spmm_bf16_accumulates_in_f32(rng):
    g = _random_graph(rng, 30, 30, 500, symmetric=True)
    x32 = rng.normal(size=(30, 8)).astype(np.float32)
    y16 = spmm(g, jnp.asarray(x32).astype(jnp.bfloat16))
    assert y16.dtype == jnp.bfloat16
    y32 = spmm(g, jnp.asarray(x32))
    # bf16 inputs carry ~3 decimal digits; near-zero sums have large
    # relative error, so bound by absolute tolerance at the data scale
    np.testing.assert_allclose(
        np.asarray(y16, dtype=np.float32), np.asarray(y32), rtol=5e-2, atol=5e-2
    )


def test_rectangular_graph_propagation(tiny_dataset, rng):
    """The EGCF/LightGCL pattern: user = R̃ @ item, item = R̃ᵀ @ user."""
    g = normalized_rectangular(tiny_dataset, cache=False)
    items = jnp.asarray(rng.normal(size=(tiny_dataset.num_items, 4)).astype(np.float32))
    users = spmm(g, items)
    back = spmm_transpose(g, users)
    R = g.to_scipy().toarray()
    np.testing.assert_allclose(np.asarray(users), R @ np.asarray(items), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(back), R.T @ np.asarray(users), rtol=1e-5, atol=1e-5)
