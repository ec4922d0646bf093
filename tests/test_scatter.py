"""ops/scatter.py — Pallas row scatter-add and the batch-gather VJP."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt

from idgrec_tpu.ops import scatter


def test_scatter_add_rows_matches_np_add_at():
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 50, 96), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(96, 8)).astype(np.float32))
    want = np.zeros((50, 8), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(vals))
    got = np.asarray(scatter.scatter_add_rows(idx, vals, 50))
    # batch-order sequential accumulation == np.add.at's order
    npt.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_gather_batch_embeddings_fwd_and_grads():
    rng = np.random.default_rng(1)
    ua = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    ia = jnp.asarray(rng.normal(size=(60, 8)).astype(np.float32))
    u = jnp.asarray(rng.integers(0, 40, 32), jnp.int32)
    p = jnp.asarray(rng.integers(0, 60, 32), jnp.int32)
    n = jnp.asarray(rng.integers(0, 60, 32), jnp.int32)

    ue, pe, ne = scatter.gather_batch_embeddings(ua, ia, u, p, n)
    assert bool(jnp.all(ue == ua[u])) and bool(jnp.all(pe == ia[p]))
    assert bool(jnp.all(ne == ia[n]))

    def f_ref(ua, ia):
        ue, pe, ne = ua[u], ia[p], ia[n]
        return jnp.sum(ue * pe) - jnp.sum(ue * ne)

    def f_got(ua, ia):
        ue, pe, ne = scatter.gather_batch_embeddings(ua, ia, u, p, n)
        return jnp.sum(ue * pe) - jnp.sum(ue * ne)

    g_ref = jax.grad(f_ref, argnums=(0, 1))(ua, ia)
    g_got = jax.grad(f_got, argnums=(0, 1))(ua, ia)
    for a, b in zip(g_ref, g_got):
        npt.assert_allclose(np.asarray(b), np.asarray(a),
                            rtol=1e-5, atol=1e-6)


def test_supports_gate():
    assert scatter.supports_fast_scatter(70_000, 64)
    assert not scatter.supports_fast_scatter(10_000_000, 64)
