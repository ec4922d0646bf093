"""Resident whole-chain kernel (ops/chainmm.py) vs the per-sweep
chain (fused_chain_t, itself pinned bit-exactly to repeated
adj.matmul in test_propagate.py). Agreement is ulp-grade, not
bitwise: compiler FMA contraction inside the one-program kernel body
shifts the f32 epilogue by ulps (chainmm module docstring), so these
tests pin tight tolerances. Reference behavior anchor:
models/LightGCN.py:36-52 (K-layer propagation + layer combine)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import numpy.testing as npt
import pytest

# Single-sweep (K=1) forward comparisons share the XLA prologue
# quantize bit-for-bit, so only compiler-FMA ulps separate the paths:
# TIGHT. Deeper chains and all gradients cross in-kernel int8
# round()s: an ulp-perturbed pre-round value near a rounding boundary
# flips a quantized activation by 1 lsb (~amax/127), so a handful of
# elements differ at quantization-step scale — the noise floor of the
# quantized chain itself, far below any real math bug (wrong vector
# binding / inject, which shift everything by O(1)): NOISE.
TIGHT = dict(rtol=3e-5, atol=3e-6)
NOISE = dict(rtol=2e-2, atol=1e-2)

from idgrec_tpu.ops import chainmm
from idgrec_tpu.ops import propagate as prop
from idgrec_tpu.ops.propagate import build_adjacency


def _x(data, rng, d=8):
    return jnp.asarray(rng.normal(size=(data.num_nodes, d)).astype(np.float32))


def _adj(data, quant):
    return build_adjacency(data, "sym", "fused", compute_dtype=quant, emb_size=8)


@pytest.mark.parametrize("quant", ["int8", "int4"])
@pytest.mark.parametrize("reduce", ["mean", "sum"])
def test_resident_matches_chain_t(tiny_dataset, rng, quant, reduce):
    adj = _adj(tiny_dataset, quant)
    assert chainmm.supports_chain_resident(adj, 8, 3, reduce, None)
    x = _x(tiny_dataset, rng)
    ref = prop.fused_chain_t(adj, x, 3, True, reduce)
    got = chainmm.fused_chain_resident(adj, x, 3, True, reduce)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), **NOISE)
    assert float(np.linalg.norm(np.asarray(got) - np.asarray(ref))
                 / np.linalg.norm(np.asarray(ref))) < 1e-2

    g_ref = jax.grad(
        lambda x: jnp.sum(prop.fused_chain_t(adj, x, 3, True, reduce) ** 2))(x)
    g_got = jax.grad(
        lambda x: jnp.sum(chainmm.fused_chain_resident(adj, x, 3, True, reduce) ** 2))(x)
    npt.assert_allclose(np.asarray(g_got), np.asarray(g_ref), **NOISE)


@pytest.mark.parametrize("include_layer0", [True, False])
@pytest.mark.parametrize("layers", [1, 2])
def test_resident_layer0_and_depth_variants(tiny_dataset, rng, include_layer0,
                                            layers):
    adj = _adj(tiny_dataset, "int4")
    x = _x(tiny_dataset, rng)
    ref = prop.fused_chain_t(adj, x, layers, include_layer0, "sum")
    got = chainmm.fused_chain_resident(adj, x, layers, include_layer0, "sum")
    npt.assert_allclose(np.asarray(got), np.asarray(ref),
                        **(TIGHT if layers == 1 else NOISE))
    g_ref = jax.grad(lambda x: jnp.sum(
        prop.fused_chain_t(adj, x, layers, include_layer0, "sum") ** 2))(x)
    g_got = jax.grad(lambda x: jnp.sum(
        chainmm.fused_chain_resident(adj, x, layers, include_layer0, "sum") ** 2))(x)
    npt.assert_allclose(np.asarray(g_got), np.asarray(g_ref), **NOISE)


def test_resident_under_jit(tiny_dataset, rng):
    adj = _adj(tiny_dataset, "int4")
    x = _x(tiny_dataset, rng)
    f = jax.jit(lambda x: chainmm.fused_chain_resident(adj, x, 3, True, "mean"))
    npt.assert_allclose(np.asarray(f(x)),
                        np.asarray(prop.fused_chain_t(adj, x, 3, True, "mean")),
                        **NOISE)


def test_supports_predicate_declines(tiny_dataset):
    # non-quant backends, diag variants, per-layer lists, activations,
    # and K=0 all decline
    adj = _adj(tiny_dataset, "int8")
    assert not chainmm.supports_chain_resident(adj, 8, 0, "mean", None)
    assert not chainmm.supports_chain_resident(adj, 8, 3, None, None)
    assert not chainmm.supports_chain_resident(adj, 8, 3, "mean", jnp.tanh)
    adj_diag = build_adjacency(tiny_dataset, "self", "fused",
                               compute_dtype="int8", emb_size=8)
    assert not chainmm.supports_chain_resident(adj_diag, 8, 3, "mean", None)
    dense = build_adjacency(tiny_dataset, "sym", "dense",
                            compute_dtype="float32")
    assert not chainmm.supports_chain_resident(dense, 8, 3, "mean", None)


def test_routed_through_lightgcn_propagate(tiny_dataset, rng):
    """models.base.lightgcn_propagate prefers the resident chain when
    it applies; the routed result agrees with the per-application
    reference at the quantization noise floor and is deterministic
    within a process."""
    from idgrec_tpu.models import base as model_base

    adj = _adj(tiny_dataset, "int4")
    x = _x(tiny_dataset, rng)
    outs = [x]
    h = x
    for _ in range(3):
        h = adj.matmul(h)
        outs.append(h)
    ref = jnp.mean(jnp.stack(outs), axis=0)
    got = model_base.lightgcn_propagate(adj, x, 3)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), **NOISE)
    # same path twice is process-deterministic
    again = chainmm.fused_chain_resident(adj, x, 3, True, "mean")
    assert bool(jnp.all(got == again))


@pytest.mark.parametrize("quant", ["int8", "int4"])
def test_resident_multiblock_grid(quant, rng):
    """Multi-block grids exercise the DISTRIBUTED epilogue paths (the
    tiny fixture compiles to a single-block grid): per-block completion
    chunks at different grid steps, cross-block amax max-accumulation,
    and lazy per-block round() at first consumption. int8 tiles at
    TI=512 give a (3, 2, 3)+ grid at this scale."""
    from idgrec_tpu.data.dataset import make_synthetic_dataset

    data = make_synthetic_dataset(5000, 1400, 30_000, 2_000, seed=5)
    adj = build_adjacency(data, "sym", "fused", compute_dtype=quant,
                          emb_size=8)
    u_pad, i_pad = adj.padded_shape
    from idgrec_tpu.ops import fusedmm
    tu = fusedmm.pick_row_tile(u_pad, default=chainmm._ROW_TILE_DEFAULT)
    ti = fusedmm.PACK_TILE if quant == "int4" else fusedmm.TI
    assert u_pad // tu >= 2, "scale must give a multi-row-block grid"
    x = _x(data, rng)
    ref = prop.fused_chain_t(adj, x, 3, True, "mean")
    got = chainmm.fused_chain_resident(adj, x, 3, True, "mean")
    npt.assert_allclose(np.asarray(got), np.asarray(ref), **NOISE)
    g_ref = jax.grad(lambda x: jnp.sum(
        prop.fused_chain_t(adj, x, 3, True, "mean") ** 2))(x)
    g_got = jax.grad(lambda x: jnp.sum(
        chainmm.fused_chain_resident(adj, x, 3, True, "mean") ** 2))(x)
    npt.assert_allclose(np.asarray(g_got), np.asarray(g_ref), **NOISE)


@pytest.mark.parametrize("seed_mode", [False, True])
def test_resident_tanh_chain_matches_chain_t(tiny_dataset, rng, seed_mode):
    """tanh-activation resident chain (EGCF family, optional parallel-
    mode seeding — reference models/EGCF.py:67-84) vs fused_chain_t,
    forward and gradients, at the quantization noise floor."""
    adj = _adj(tiny_dataset, "int4")
    assert chainmm.supports_chain_resident(
        adj, 8, 2, "sum", jnp.tanh, include_layer0=False, seed=seed_mode)
    nu = tiny_dataset.num_users
    x = _x(tiny_dataset, rng)
    if seed_mode:
        x = x.at[:nu].set(0.0)  # EGCF x0: zero user side

    def ref_fn(x):
        return prop.fused_chain_t(adj, x, 2, include_layer0=False,
                                  reduce="sum", activation=jnp.tanh,
                                  seed_users_from_items=seed_mode)

    def got_fn(x):
        return chainmm.fused_chain_resident(adj, x, 2, include_layer0=False,
                                            reduce="sum", activation=jnp.tanh,
                                            seed_users_from_items=seed_mode)

    ref = ref_fn(x)
    got = got_fn(x)
    npt.assert_allclose(np.asarray(got), np.asarray(ref), **NOISE)

    g_ref = jax.grad(lambda x: jnp.sum(ref_fn(x) ** 2))(x)
    g_got = jax.grad(lambda x: jnp.sum(got_fn(x) ** 2))(x)
    if seed_mode:
        # the zero user input has no gradient path (the seed discards
        # its item-direction product): d(x0_user) = 0 exactly
        assert bool(jnp.all(g_got[:nu] == 0.0))
        npt.assert_allclose(np.asarray(g_got[nu:]), np.asarray(g_ref[nu:]),
                            **NOISE)
    else:
        npt.assert_allclose(np.asarray(g_got), np.asarray(g_ref), **NOISE)


def test_resident_tanh_multiblock(rng):
    """Multi-block grid coverage for the tanh/seed paths (per-block h
    streaming, staged tanh-derivative fetches, seed-bwd sweep)."""
    from idgrec_tpu.data.dataset import make_synthetic_dataset

    data = make_synthetic_dataset(5000, 1400, 30_000, 2_000, seed=5)
    adj = build_adjacency(data, "sym", "fused", compute_dtype="int8",
                          emb_size=8)
    nu = data.num_users
    x = _x(data, rng).at[:nu].set(0.0)

    def ref_fn(x):
        return prop.fused_chain_t(adj, x, 3, include_layer0=False,
                                  reduce="sum", activation=jnp.tanh,
                                  seed_users_from_items=True)

    def got_fn(x):
        return chainmm.fused_chain_resident(adj, x, 3, include_layer0=False,
                                            reduce="sum", activation=jnp.tanh,
                                            seed_users_from_items=True)

    npt.assert_allclose(np.asarray(got_fn(x)), np.asarray(ref_fn(x)), **NOISE)
    g_ref = jax.grad(lambda x: jnp.sum(ref_fn(x) ** 2))(x)
    g_got = jax.grad(lambda x: jnp.sum(got_fn(x) ** 2))(x)
    npt.assert_allclose(np.asarray(g_got[nu:]), np.asarray(g_ref[nu:]),
                        **NOISE)
