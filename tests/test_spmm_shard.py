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
    # dense+int8: the matrix is only 128-padded (i_pad=384 here, NOT a
    # TI=512 multiple) — the sharded path must take the XLA fallback,
    # not the fused kernel whose grid would truncate columns
    ("dense", "int8"),
    ("fused", "bfloat16"),
    ("fused", "int8"),
    ("fused", "int4"),
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


# ---------------------------------------------------------------------------
# Sharded gather (sparse COO) backend — VERDICT round-1 missing item 2:
# the over-dense-budget regime. Edge-chunked shard_map: 1/N edges per
# chip, all_gather + psum_scatter of activations.


def test_sharded_gather_matches_single_device():
    adj = build_adjacency(DATA, "sym", "gather")
    want = np.asarray(adj.matmul(X), np.float32)
    mesh = _mesh(model=4)

    @jax.jit
    def f(adj, x):
        with use_mesh(mesh):
            return adj.matmul(x)

    got = np.asarray(f(adj, X), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sharded_gather_gate_matches_single_device():
    adj = build_adjacency(DATA, "sym", "gather")
    gate = jnp.asarray(
        np.random.default_rng(3).uniform(0.5, 1.5, X.shape[0]).astype(np.float32)
    )
    want = np.asarray(adj.matmul(X, gate), np.float32)
    mesh = _mesh(model=2)

    @jax.jit
    def f(adj, x, g):
        with use_mesh(mesh):
            return adj.matmul(x, g)

    got = np.asarray(f(adj, X, gate), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sharded_gather_gradient_matches_single_device():
    adj = build_adjacency(DATA, "sym", "gather")
    tgt = jnp.asarray(
        np.random.default_rng(5).normal(size=X.shape).astype(np.float32)
    )

    def loss(adj, x):
        return jnp.sum(adj.matmul(x) * tgt)

    want = np.asarray(jax.grad(loss, argnums=1)(adj, X))
    mesh = _mesh(model=4)

    @jax.jit
    def g(adj, x):
        with use_mesh(mesh):
            return jax.grad(loss, argnums=1)(adj, x)

    got = np.asarray(g(adj, X))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


def test_sharded_gather_rect_both_directions():
    from idgrec_tpu.ops.propagate import build_rect_adjacency

    adj = build_rect_adjacency(DATA, backend="gather")
    xu = X[: DATA.num_users]
    xi = X[DATA.num_users : DATA.num_users + DATA.num_items]
    want_f = np.asarray(adj.matmul(xi), np.float32)
    want_t = np.asarray(adj.t_matmul(xu), np.float32)
    mesh = _mesh(model=4)

    @jax.jit
    def f(adj, xi, xu):
        with use_mesh(mesh):
            return adj.matmul(xi), adj.t_matmul(xu)

    got_f, got_t = f(adj, xi, xu)
    np.testing.assert_allclose(np.asarray(got_f), want_f, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_t), want_t, rtol=2e-5, atol=2e-5)


def test_sharded_gather_collective_structure():
    """1/N edge chunk per chip in the shard_map body; activation
    all-gather + psum-scatter; no collective without a mesh."""
    adj = build_adjacency(DATA, "sym", "gather")
    mesh = _mesh(model=4)

    def f(adj, x):
        with use_mesh(mesh):
            return adj.matmul(x)

    jaxpr = str(jax.make_jaxpr(f)(adj, X))
    assert "all_gather" in jaxpr
    assert "psum_scatter" in jaxpr or "reduce_scatter" in jaxpr
    # the body sees a 1/4 chunk of the padded edge arrays
    e_pad = adj.graph.rows.shape[0]
    assert f"i32[{e_pad // 4}]" in jaxpr.replace(" ", "")

    compiled = jax.jit(f).lower(adj, X).compile().as_text()
    assert re.search(r"all-gather", compiled)
    assert re.search(r"reduce-scatter", compiled)

    # single-chip trace: no collectives
    jaxpr1 = str(jax.make_jaxpr(lambda a, x: a.matmul(x))(adj, X))
    assert "all_gather" not in jaxpr1


def test_gather_backend_trains_on_mesh():
    """Engine-level: LightGCN forced onto the gather backend trains to
    the single-device trajectory on a 2x4 mesh."""
    from idgrec_tpu.config import Config
    from idgrec_tpu.engine.loop import train_model

    data = make_synthetic_dataset(67, 83, 1024, 128, seed=21, name="tiny")
    cfg = Config({
        "dataset": "tiny", "top_K": "[3, 5]", "training_epochs": "2",
        "early_stopping": "10", "interval": "1", "embedding_size": "16",
        "batch_size": "64", "test_batch_size": "32", "learn_rate": "0.01",
        "reg_lambda": "0.0001", "GCN_layer": "2",
        "propagation_backend": "gather",
    })
    r1 = train_model("LightGCN", data, config=cfg, seed=5, log_dir=None, echo=False)
    mesh = make_mesh(8, data_parallel=2)
    r2 = train_model("LightGCN", data, config=cfg, seed=5, log_dir=None,
                     echo=False, mesh=mesh)
    for h1, h2 in zip(r1.history, r2.history):
        l1 = float(h1["loss"].split(" = ")[0])
        l2 = float(h2["loss"].split(" = ")[0])
        np.testing.assert_allclose(l1, l2, rtol=2e-3, atol=1e-4)
    for key in r1.params:
        a = np.asarray(r1.params[key], np.float32)
        b = np.asarray(r2.params[key], np.float32)
        assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 2e-3, key


def test_local_dual_int8_falls_back_when_shard_rows_not_128():
    """Review fix: wide model axes can leave per-shard row counts that
    are not 128-multiples (fused rows pad to 1024, so width 16 on
    yelp2018's 31744 gives 1984) — the local int8 dual product must
    fall back to the XLA path instead of tripping the Pallas kernel's
    row-tile assert. Exercised directly with a 64-row shard (the mesh
    harness here caps at 8 devices, which cannot produce one)."""
    rng = np.random.default_rng(0)
    m_k = jnp.asarray(rng.integers(0, 2, (64, 512)), jnp.int8)
    qu = jnp.asarray(rng.integers(-127, 128, (64, 16)), jnp.int8)
    qi = jnp.asarray(rng.integers(-127, 128, (512, 16)), jnp.int8)
    yu, yi = spmm_shard._local_dual_int8(m_k, qu, qi, interpret=True)
    m_f = np.asarray(m_k, np.float32)
    np.testing.assert_allclose(np.asarray(yu), m_f @ np.asarray(qi, np.float32))
    np.testing.assert_allclose(np.asarray(yi), m_f.T @ np.asarray(qu, np.float32))


def test_make_mesh_rejects_bad_data_parallel():
    with pytest.raises(ValueError, match="data_parallel"):
        make_mesh(8, data_parallel=3)
    with pytest.raises(ValueError, match="data_parallel"):
        make_mesh(8, data_parallel=16)


def test_sharded_gather_gradient_bf16_embeddings():
    """bf16 activations through the sharded gather path: the custom
    VJP's cotangent must carry the PRIMAL's dtype (f32 accumulation,
    output cast back — the ops/spmm.py contract); an f32 dx against a
    bf16 primal is a hard custom_vjp aval mismatch under jit."""
    adj = build_adjacency(DATA, "sym", "gather")
    xb = X.astype(jnp.bfloat16)
    tgt = jnp.asarray(
        np.random.default_rng(5).normal(size=X.shape).astype(np.float32)
    )

    def loss(adj, x):
        return jnp.sum(adj.matmul(x).astype(jnp.float32) * tgt)

    want = np.asarray(jax.grad(loss, argnums=1)(adj, xb), np.float32)
    mesh = _mesh(model=4)

    @jax.jit
    def g(adj, x):
        with use_mesh(mesh):
            return jax.grad(loss, argnums=1)(adj, x)

    got = np.asarray(g(adj, xb), np.float32)
    assert got.dtype == want.dtype
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_gather_collective_bytes_match_dense_path():
    """SCALING.md claims the sharded GATHER backend's per-application
    collective payload is identical to the dense path's (all_gather of
    the [i_pad, d] activations in, reduce-scatter of the output
    shards) — pin it from compiled HLO the way the dense test does."""
    adj = build_adjacency(DATA, "sym", "gather")
    n = DATA.num_users + DATA.num_items
    d = X.shape[1]
    for model in (2, 4):
        mesh = _mesh(model=model)

        def f(adj, x):
            with use_mesh(mesh):
                return adj.matmul(x)

        compiled = jax.jit(f).lower(adj, X).compile().as_text()
        gathers = re.findall(r"f32\[(\d+),(\d+)\][^\n]*all-gather", compiled)
        scatters = re.findall(r"f32\[(\d+),(\d+)\][^\n]*reduce-scatter",
                              compiled)
        # activations gathered at full [n_pad >= n, d] once per
        # application; output reduce-scattered at the 1/N shard
        assert any(int(r) >= n and int(c) == d for r, c in gathers), (
            f"missing full-activation all-gather at model={model}: {gathers}")
        assert any(int(r) * model <= 2 * n and int(c) == d
                   for r, c in scatters), (
            f"missing output-shard reduce-scatter at model={model}: "
            f"{scatters}")
        # and no collective carries the EDGE arrays (payload must be
        # O(n*d) activations, never O(nnz))
        nnz = int(DATA.num_train)
        for r, c in gathers + scatters:
            assert int(r) * int(c) < 4 * n * d, (
                f"collective payload {r}x{c} scales beyond activations "
                f"(nnz={nnz}) at model={model}")
