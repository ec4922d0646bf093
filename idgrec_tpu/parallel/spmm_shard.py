"""Explicit sharded propagation: shard_map + ICI collectives wrapping
the single-chip propagation kernels.

This is the north-star kernel of the whole framework (BASELINE.json):
the reference's one heavy primitive is ``torch.sparse.mm(Graph, E)``
(reference models/LightGCN.py:44) on a single GPU; here the square
normalized adjacency Â = diag(L)·[[0,M],[Mᵀ,0]]·diag(R) is partitioned
over the mesh's ``model`` axis and each application runs with explicit
collectives instead of GSPMD auto-partitioning:

* the int8 count matrix M [U_pad, I_pad] is ROW-sharded: chip k holds
  M_k = M[k·U_pad/N : (k+1)·U_pad/N, :] — each chip reads 1/N of the
  adjacency bytes per application (the HBM-bound resource);
* ``yu = M @ zi`` needs all item activations: one ``all_gather`` of the
  zi shards over ICI ([I_pad, d] — ~5-10 MB at yelp2018 scale, tiny
  next to the 1/N adjacency read);
* ``yi = Mᵀ @ zu`` factors as Σ_k M_kᵀ @ zu_k: each chip contracts its
  OWN zu rows (no gather needed) and a ``psum_scatter`` both reduces
  the partial sums and leaves yi row-sharded for the next layer;
* inside the per-chip body the single-chip Pallas kernels run
  unchanged (ops/fusedmm.py bf16/int8 single-sweep kernels), so
  multi-chip *keeps* the single-chip kernel wins — the per-shard row
  count (U_pad/N, a 128-multiple) picks a smaller row tile via
  ``fusedmm.pick_row_tile``.

Backward passes ride the same structure: the Pallas kernels carry
their swapped-cotangent custom VJPs, and JAX transposes the
collectives around them (all_gather ↔ psum_scatter are adjoint), so
the backward pass also reads 1/N of M per chip with one gather +
one reduce-scatter.

The routing happens at trace time inside the engine's jitted step:
`ops/propagate.py` calls `maybe_sharded_square_matmul` when
`parallel.mesh.use_mesh` is active with a model axis > 1.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from idgrec_tpu.ops import fusedmm
from idgrec_tpu.ops.propagate import _pad_rows

_MODEL_AXIS = "model"


def model_width(mesh) -> int:
    return int(mesh.shape.get(_MODEL_AXIS, 1))


def can_shard(u_pad: int, i_pad: int, mesh) -> bool:
    """Both padded dims must divide the model axis (guaranteed for the
    128-multiple padding whenever the axis is a power of two ≤ 128)."""
    n = model_width(mesh)
    return n > 1 and u_pad % n == 0 and i_pad % n == 0


def _row_sharded(mesh, *arrays):
    s = NamedSharding(mesh, P(_MODEL_AXIS, None))
    return tuple(jax.lax.with_sharding_constraint(a, s) for a in arrays)


# ---------------------------------------------------------------------------
# Per-chip local dual products (called inside shard_map)


def _local_dual_bf16_fused(m_k, zu_k, zi_all, interpret):
    """(M_k @ zi_all, M_kᵀ @ zu_k) via the single-sweep Pallas kernel
    (differentiable: fusedmm custom VJP + collective transposition)."""
    return fusedmm.fused_adj_matmul(m_k, zu_k, zi_all, interpret)


def _local_dual_dense(m_k, zu_k, zi_all, cdt):
    mm = m_k.astype(cdt)
    yu = jnp.matmul(mm, zi_all.astype(cdt), preferred_element_type=jnp.float32)
    yi = jax.lax.dot_general(
        mm, zu_k.astype(cdt),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return yu, yi


def _local_dual_int8(m_k, qu_k, qi_all, interpret):
    """Raw int8 products (not differentiable — the quant wrapper owns
    the straight-through VJP). Kernel when accumulators fit, else XLA."""
    u_loc, i_pad = m_k.shape
    d = qi_all.shape[1]
    # mirror fused_adj_matmul_int8's internal dispatch: the single-panel
    # kernel (whole-yi VMEM accumulator) needs a TI-multiple column
    # count — its grid i_pad//TI TRUNCATES otherwise, silently dropping
    # the last columns; the panelized kernel needs a PANEL multiple and
    # the yu accumulator budget. Dense-backend matrices are only
    # 128-padded (propagate._pad_up), so both can fail here -> XLA.
    small_fits = i_pad * d * 4 <= fusedmm.MAX_YI_VMEM_BYTES
    kernel_ok = (
        (small_fits and i_pad % fusedmm.TI == 0)
        or (not small_fits and i_pad % fusedmm.PANEL == 0
            and u_loc * d * 4 <= fusedmm.MAX_YU_VMEM_BYTES)
    )
    # per-shard row count must admit a power-of-two row tile ≥ 128
    # (fusedmm.pick_row_tile) — wide model axes can leave a non-128
    # multiple (e.g. 31744/16 = 1984), which must fall back, not assert
    row_ok = u_loc % 128 == 0
    if kernel_ok and row_ok:
        return fusedmm.fused_adj_matmul_int8(m_k, qu_k, qi_all, interpret)
    yu = jnp.matmul(m_k, qi_all, preferred_element_type=jnp.int32).astype(jnp.float32)
    yi = jax.lax.dot_general(
        m_k, qu_k,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return yu, yi


def _local_dual_int4(m_k, qu_k, qi_all, interpret):
    """int4 twin of _local_dual_int8: m_k is the NIBBLE-PACKED row
    shard (fusedmm.pack_nibbles layout) — per-chip adjacency reads are
    1/(2N) of the int8 full-matrix bytes."""
    u_loc = m_k.shape[0]
    i_pad = 2 * m_k.shape[1]
    d = qi_all.shape[1]
    # same dispatch mirror as _local_dual_int8 (grid-truncation guard);
    # int4 kernels are PACK_TILE-granular in the column dimension
    small_fits = i_pad * d * 4 <= fusedmm.MAX_YI_VMEM_BYTES
    kernel_ok = (
        (small_fits and i_pad % fusedmm.PACK_TILE == 0)
        or (not small_fits and i_pad % fusedmm.PANEL == 0
            and u_loc * d * 4 <= fusedmm.MAX_YU_VMEM_BYTES)
    )
    row_ok = u_loc % 128 == 0
    if kernel_ok and row_ok:
        return fusedmm.fused_adj_matmul_int4(m_k, qu_k, qi_all, interpret)
    m8 = fusedmm.unpack_nibbles(m_k)
    yu = jnp.matmul(m8, qi_all, preferred_element_type=jnp.int32).astype(jnp.float32)
    yi = jax.lax.dot_general(
        m8, qu_k,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)
    return yu, yi


# ---------------------------------------------------------------------------
# Sharded dual application (fwd structure shared by every flavor)


def _shard_dual(local_fn, mesh, m8, zu, zi):
    """shard_map wrapper: all_gather zi, local dual product over the
    row shard, psum_scatter yi. Inputs/outputs row-sharded over
    'model' (replicated over every other mesh axis)."""

    def body(m_k, zu_k, zi_k):
        zi_all = jax.lax.all_gather(zi_k, _MODEL_AXIS, axis=0, tiled=True)
        yu_k, yi_part = local_fn(m_k, zu_k, zi_all)
        yi_k = jax.lax.psum_scatter(
            yi_part, _MODEL_AXIS, scatter_dimension=0, tiled=True
        )
        return yu_k, yi_k

    spec = P(_MODEL_AXIS, None)
    # check_vma=False: pallas_call outputs carry no varying-mesh-axes
    # metadata, which the checker requires on every ShapeDtypeStruct
    return jax.shard_map(
        body, mesh=mesh, in_specs=(spec, spec, spec), out_specs=(spec, spec),
        check_vma=False,
    )(m8, zu, zi)


def _quant_dual_sharded(mesh, interpret, bits, m8, zi, zu):
    # the single-chip quantization scheme (ops/propagate._quantize_cols)
    # applied to the SHARDED arrays: the column max is a global
    # reduction under GSPMD, so sharded and single-chip scales agree
    # exactly
    from idgrec_tpu.ops.propagate import _quantize_cols

    qi, si = _quantize_cols(zi)
    qu, su = _quantize_cols(zu)
    local_fn = _local_dual_int4 if bits == "int4" else _local_dual_int8
    local = partial(local_fn, interpret=interpret)
    yu, yi = _shard_dual(local, mesh, m8, qu, qi)
    return yu * si, yi * su


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def quant_sharded_dual(mesh, interpret, bits, m8, zi, zu):
    """(M @ q8(zi), Mᵀ @ q8(zu)) over the mesh — int8 MXU per shard,
    straight-through quantized backward (sharded counterpart of
    ops/propagate.quant_fused_dual). bits: 'int8' (m8 = full int8
    matrix shard) or 'int4' (m8 = nibble-packed, half the per-chip
    adjacency bytes)."""
    return _quant_dual_sharded(mesh, interpret, bits, m8, zi, zu)


def _qsd_fwd(mesh, interpret, bits, m8, zi, zu):
    return _quant_dual_sharded(mesh, interpret, bits, m8, zi, zu), m8


def _qsd_bwd(mesh, interpret, bits, m8, g):
    g_yu, g_yi = g
    dzu, dzi = _quant_dual_sharded(mesh, interpret, bits, m8, g_yi, g_yu)
    dm = np.zeros(m8.shape, dtype=jax.dtypes.float0)
    return dm, dzi, dzu


quant_sharded_dual.defvjp(_qsd_fwd, _qsd_bwd)


# ---------------------------------------------------------------------------
# Full square-adjacency application under the mesh


def sharded_square_matmul(adj, x, gate, mesh, *, kind):
    """Â @ x with the adjacency row-sharded over mesh's 'model' axis.

    adj: DenseSquareAdj (kind='dense') or FusedSquareAdj (kind='fused')
    — same scale/diag semantics as their single-chip `matmul`, same
    result to f32 round-off (pinned by tests/test_spmm_shard.py).
    """
    if kind == "fused":
        m = adj.m8
        u_pad, i_pad = adj.padded_shape  # int4 stores half-width packed
    else:
        m = adj.m
        u_pad, i_pad = m.shape
    nu, ni = adj.num_users, adj.num_items
    xu, xi = x[:nu], x[nu:]
    right_u, right_i = adj.right_u, adj.right_i
    left_u, left_i = adj.left_u, adj.left_i
    if gate is not None:
        gu, gi = gate[:nu], gate[nu:]
        right_u, right_i = right_u * gu, right_i * gi
        left_u, left_i = left_u * gu, left_i * gi

    zu = _pad_rows(right_u[:, None] * xu.astype(jnp.float32), u_pad)
    zi = _pad_rows(right_i[:, None] * xi.astype(jnp.float32), i_pad)

    # DenseSquareAdj carries no interpret flag (single-chip dense never
    # runs Pallas) — when ITS int8 path is promoted to the fused kernel
    # here, derive the flag from the backend so CPU meshes (tests,
    # dryrun_multichip) run interpreted instead of attempting Mosaic
    interpret = getattr(adj, "interpret", None)
    if interpret is None:
        interpret = fusedmm.interpret_default()
    width = model_width(mesh)
    if adj.quant in ("int8", "int4"):
        m, zu, zi = _row_sharded(mesh, m, zu, zi)
        yu_raw, yi_raw = quant_sharded_dual(mesh, interpret, adj.quant, m, zi, zu)
    else:
        if kind == "fused":
            cdt = jnp.bfloat16
            if (i_pad * x.shape[1] * 4 > fusedmm.MAX_YI_VMEM_BYTES
                    or (u_pad // width) % 128 != 0):
                # bf16 kernel's whole-yi VMEM accumulator would overflow
                # (very wide catalog / multi-chain feature batching), or
                # the per-shard row count admits no ≥128 power-of-two
                # row tile: per-shard XLA bf16 matmuls, same collectives
                local = partial(_local_dual_dense, cdt=cdt)
            else:
                local = partial(_local_dual_bf16_fused, interpret=interpret)
        else:
            cdt = jnp.dtype(adj.compute_dtype_name)
            local = partial(_local_dual_dense, cdt=cdt)
        # cast BEFORE the collectives: the matmul computes in cdt either
        # way (numerically identical), and a bf16 zi halves the
        # all_gather payload — the int8 path quantizes pre-gather for
        # the same reason
        zu = zu.astype(cdt)
        zi = zi.astype(cdt)
        m, zu, zi = _row_sharded(mesh, m, zu, zi)
        yu_raw, yi_raw = _shard_dual(local, mesh, m, zu, zi)

    yu = left_u[:, None] * yu_raw[:nu]
    yi = left_i[:, None] * yi_raw[:ni]
    if adj.has_diag:
        yu = yu + adj.diag_u[:, None] * xu.astype(jnp.float32)
        yi = yi + adj.diag_i[:, None] * xi.astype(jnp.float32)
    return jnp.concatenate([yu, yi], axis=0).astype(x.dtype)


# ---------------------------------------------------------------------------
# Sharded gather (sparse COO) propagation — the over-dense-budget regime
# (VERDICT round-1 missing item 2). The edge list is globally
# row-sorted and padded to a 1024 multiple (data/graph.py SparseGraph),
# so chip k takes the contiguous edge chunk [k·E/N, (k+1)·E/N): per-chip
# adjacency reads AND storage are 1/N (the regime exists precisely
# because the matrix exceeds one HBM). Rows may straddle chunk
# boundaries, so each chip segment-sums into the full global row space
# and ONE psum_scatter both reduces the boundary partials and leaves
# the result row-sharded — the same all_gather + psum_scatter pair as
# the dense path, with the identical activation-bytes-only payload.
# Reference anchor: torch.sparse.mm (reference models/LightGCN.py:44).


def can_shard_edges(nnz_padded: int, mesh) -> bool:
    n = model_width(mesh)
    return n > 1 and nnz_padded % n == 0


def _node_pad(n: int, width: int) -> int:
    # 128-multiples divide any power-of-two model axis ≤ 128 and keep
    # the row-sharded layouts aligned with the engine's table padding
    m = 128 if 128 % width == 0 else width
    return -(-n // m) * m


def _sharded_spmm_impl(mesh, n_rows_pad, rows, cols, vals, x):
    espec = NamedSharding(mesh, P(_MODEL_AXIS))
    rows, cols, vals = (
        jax.lax.with_sharding_constraint(a, espec) for a in (rows, cols, vals)
    )
    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(_MODEL_AXIS, None))
    )

    def body(r_k, c_k, v_k, x_k):
        x_all = jax.lax.all_gather(x_k, _MODEL_AXIS, axis=0, tiled=True)
        gathered = jnp.take(x_all, c_k, axis=0).astype(jnp.float32)
        # global row ids stay sorted within the contiguous chunk
        part = jax.ops.segment_sum(
            gathered * v_k[:, None], r_k,
            num_segments=n_rows_pad, indices_are_sorted=True,
        )
        return jax.lax.psum_scatter(
            part, _MODEL_AXIS, scatter_dimension=0, tiled=True
        )

    spec_e = P(_MODEL_AXIS)
    spec_x = P(_MODEL_AXIS, None)
    y = jax.shard_map(
        body, mesh=mesh, in_specs=(spec_e, spec_e, spec_e, spec_x),
        out_specs=spec_x, check_vma=False,
    )(rows, cols, vals, x)
    # match the single-chip contract (ops/spmm.py: f32 accumulation,
    # output in x's dtype) — also keeps the custom-VJP cotangent dtype
    # equal to the primal's for bf16 embeddings
    return y.astype(x.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _sharded_spmm(mesh, dims, rows, cols, vals, t_rows, t_cols, t_vals, x):
    """Sharded y = A @ x on padded node spaces; dims = (n_rows_pad,
    n_cols_pad). Differentiable in x only; backward runs the SAME
    sharded kernel on the pre-sorted transpose arrays, so the gradient
    also reads 1/N of the edges per chip."""
    n_rows_pad, _ = dims
    return _sharded_spmm_impl(mesh, n_rows_pad, rows, cols, vals, x)


def _ss_fwd(mesh, dims, rows, cols, vals, t_rows, t_cols, t_vals, x):
    n_rows_pad, _ = dims
    y = _sharded_spmm_impl(mesh, n_rows_pad, rows, cols, vals, x)
    return y, (t_rows, t_cols, t_vals)


def _ss_bwd(mesh, dims, res, g):
    _, n_cols_pad = dims
    t_rows, t_cols, t_vals = res
    dx = _sharded_spmm_impl(mesh, n_cols_pad, t_rows, t_cols, t_vals, g)
    f0 = np.zeros(t_rows.shape, dtype=jax.dtypes.float0)
    zv = jnp.zeros(t_vals.shape, dtype=jnp.float32)
    return (f0, f0, zv, f0, f0, zv, dx)


_sharded_spmm.defvjp(_ss_fwd, _ss_bwd)


def maybe_sharded_spmm(graph, x):
    """Explicit-collective spmm when a model-axis mesh is active and
    the padded edge count divides it; None -> caller runs single-chip.
    Works for square and rectangular graphs (padding entries point at
    the last row/col with val 0, harmless in the padded node space)."""
    from idgrec_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_active_mesh()
    if mesh is None or not can_shard_edges(graph.rows.shape[0], mesh):
        return None
    width = model_width(mesh)
    n_rows_pad = _node_pad(graph.n_rows, width)
    n_cols_pad = _node_pad(graph.n_cols, width)
    x_pad = _pad_rows(x, n_cols_pad)
    y = _sharded_spmm(
        mesh, (n_rows_pad, n_cols_pad),
        graph.rows, graph.cols, graph.vals,
        graph.t_rows, graph.t_cols, graph.t_vals,
        x_pad,
    )
    return y[: graph.n_rows].astype(x.dtype)


def maybe_sharded_square_matmul(adj, x, gate, *, kind):
    """Route to the explicit sharded path when an active mesh with a
    model axis > 1 is bound (parallel.mesh.use_mesh) and the padded
    dims divide it; returns None otherwise (caller runs single-chip)."""
    from idgrec_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_active_mesh()
    if mesh is None:
        return None
    if kind == "fused":
        u_pad, i_pad = adj.padded_shape
    else:
        u_pad, i_pad = adj.m.shape
    if not can_shard(u_pad, i_pad, mesh):
        return None
    return sharded_square_matmul(adj, x, gate, mesh, kind=kind)
