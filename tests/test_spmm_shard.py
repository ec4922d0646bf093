"""Explicit sharded propagation (parallel/spmm_shard.py): equivalence
with the single-chip backends to f32 round-off, explicit-collective
structure in the compiled HLO, and 1/N per-chip adjacency reads.

Reference anchor: torch.sparse.mm (reference models/LightGCN.py:44) —
the primitive this path re-engineers at pod scale (BASELINE.json
north star; VERDICT round-1 item 1).
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from idgrec_tpu.data.dataset import make_synthetic_dataset
from idgrec_tpu.ops.propagate import build_adjacency
from idgrec_tpu.parallel import spmm_shard
from idgrec_tpu.parallel.mesh import make_mesh, param_shardings, use_mesh

# users pad to 1024 (fused pad_matrix) / 128 (dense); items to 512 /
# 128; both divide every model-axis width tested
DATA = make_synthetic_dataset(400, 300, 4000, 500, seed=7, name="shardtest")
X = jnp.asarray(
    np.random.default_rng(0).normal(size=(700, 16)).astype(np.float32)
)


def _mesh(model=4):
    return make_mesh(8, data_parallel=8 // model)


def _apply(adj, x, mesh):
    """adj.matmul traced with the active mesh bound (the engine's
    use_mesh wrapping in trainer/evaluator)."""

    @jax.jit
    def f(adj, x):
        with use_mesh(mesh):
            return adj.matmul(x)

    return f(adj, x)


@pytest.mark.parametrize("backend,cdt", [
    ("dense", "bfloat16"),
    ("dense", "float32"),
    ("fused", "bfloat16"),
    ("fused", "int8"),
])
def test_sharded_matmul_matches_single_device(backend, cdt):
    adj = build_adjacency(DATA, "sym", backend, compute_dtype=cdt)
    mesh = _mesh(model=4)
    sharded_adj = jax.device_put(adj, param_shardings(adj, mesh))
    want = np.asarray(adj.matmul(X))
    got = np.asarray(_apply(sharded_adj, X, mesh))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sharded_matmul_with_self_loop_diag():
    adj = build_adjacency(DATA, "self", "dense", compute_dtype="float32")
    mesh = _mesh(model=2)
    want = np.asarray(adj.matmul(X))
    got = np.asarray(_apply(adj, X, mesh))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sharded_matmul_with_gate():
    adj = build_adjacency(DATA, "sym", "dense", compute_dtype="float32")
    gate = jnp.asarray(
        (np.random.default_rng(1).random(700) > 0.3).astype(np.float32)
    )
    mesh = _mesh(model=4)
    want = np.asarray(adj.matmul(X, gate))

    @jax.jit
    def f(adj, x, g):
        with use_mesh(mesh):
            return adj.matmul(x, g)

    np.testing.assert_allclose(np.asarray(f(adj, X, gate)), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("backend,cdt", [
    ("dense", "float32"),
    ("fused", "bfloat16"),
    ("fused", "int8"),
])
def test_sharded_gradient_matches_single_device(backend, cdt):
    """Backward pass rides the transposed collectives (all_gather ↔
    psum_scatter) around the kernels' custom VJPs."""
    adj = build_adjacency(DATA, "sym", backend, compute_dtype=cdt)
    mesh = _mesh(model=4)
    tgt = jnp.asarray(
        np.random.default_rng(3).normal(size=(700, 16)).astype(np.float32)
    )

    def loss(adj, x):
        y = adj.matmul(x)
        return jnp.sum(y * tgt)

    want = np.asarray(jax.grad(loss, argnums=1)(adj, X))

    @jax.jit
    def g(adj, x):
        with use_mesh(mesh):
            return jax.grad(loss, argnums=1)(adj, x)

    got = np.asarray(g(adj, X))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_collective_structure_in_hlo():
    """The compiled sharded application must contain explicit
    all-gather and reduce-scatter ops, and the shard_map body must see
    a 1/N row slice of the adjacency (VERDICT round-1 item 10)."""
    adj = build_adjacency(DATA, "sym", "dense", compute_dtype="float32")
    mesh = _mesh(model=4)

    def f(adj, x):
        with use_mesh(mesh):
            return adj.matmul(x)

    jaxpr = str(jax.make_jaxpr(f)(adj, X))
    assert "all_gather" in jaxpr
    assert "psum_scatter" in jaxpr or "reduce_scatter" in jaxpr
    # the shard_map body's adjacency operand is the 1/4 row shard
    u_pad, i_pad = adj.m.shape
    assert f"i8[{u_pad // 4},{i_pad}]" in jaxpr.replace(" ", "")

    compiled = jax.jit(f).lower(adj, X).compile().as_text()
    assert re.search(r"all-gather", compiled)
    assert re.search(r"reduce-scatter", compiled)


def test_collective_bytes_scale_with_mesh():
    """all_gather payload is O(I_pad·d) regardless of mesh width: the
    communicated bytes per application are the activation shards, not
    the adjacency."""
    adj = build_adjacency(DATA, "sym", "dense", compute_dtype="float32")
    u_pad, i_pad = adj.m.shape
    d = X.shape[1]
    for model in (2, 4, 8):
        mesh = _mesh(model=model)

        def f(adj, x):
            with use_mesh(mesh):
                return adj.matmul(x)

        compiled = jax.jit(f).lower(adj, X).compile().as_text()
        # all-gather output at full [i_pad, d] f32 (gathered zi) and
        # reduce-scatter output at the [i_pad/N, d] yi shard
        assert re.search(
            rf"f32\[{i_pad},{d}\][^\n]*all-gather", compiled
        ), f"missing zi all-gather at model={model}"
        assert re.search(
            rf"f32\[{i_pad // model},{d}\][^\n]*reduce-scatter", compiled
        ), f"missing yi reduce-scatter at model={model}"


def test_no_sharding_outside_mesh_context():
    """Without an active mesh the single-chip path runs (no collectives)."""
    adj = build_adjacency(DATA, "sym", "dense", compute_dtype="float32")
    jaxpr = str(jax.make_jaxpr(lambda a, x: a.matmul(x))(adj, X))
    assert "all_gather" not in jaxpr


def test_can_shard_guard():
    mesh = _mesh(model=4)
    assert spmm_shard.can_shard(1024, 512, mesh)
    assert not spmm_shard.can_shard(1023, 512, mesh)
    assert not spmm_shard.can_shard(1024, 514, mesh)
    assert not spmm_shard.can_shard(1024, 512, _mesh(model=1))
