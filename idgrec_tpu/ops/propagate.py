"""Graph propagation backends (the framework's hot path).

Every model's aggregation is ``Â·E`` against one of the reference's
normalizations (data_graph.py:7,33,58; LightGCN_pp.py:42-73). Two
TPU backends implement it:

* **dense** (default when it fits): the key observation is that every
  normalization factors exactly as
      Â = diag(L) · M · diag(R)   (+ optional self-loop diagonal)
  where M is the *integer* interaction-count matrix. M is stored as a
  dense int8 [num_users, num_items] array; propagation is then a pair
  of MXU matmuls with the int8→bf16 upcast fused into the read, plus
  elementwise scale vectors. Measured on a v5e chip at yelp2018 scale
  this is HBM-speed-of-light on int8 bytes (~1.6 ms per direction) —
  ~16× faster than gather/segment-sum, and *exact* (integer counts,
  f32 scales; only the activation matmul runs in bf16/f32 per the
  compute dtype policy).

* **gather**: row-sorted COO gather + sorted segment-sum
  (idgrec_tpu.ops.spmm) — fully general, used when the dense count
  matrix would not fit (``num_users·num_items`` bytes over the budget)
  or when value-level graph dropout is requested.

Both backends expose the same facade (`AdjacencyOps`), so models are
backend-agnostic. Gradients: d/dx runs through the same structure
transposed (XLA autodiff for dense; custom VJP inside spmm for gather).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.data import native as data_native
from idgrec_tpu.data.dataset import Dataset
from idgrec_tpu.data import graph as graph_lib
from idgrec_tpu.data.graph import SparseGraph
from idgrec_tpu.ops import bitmm, fusedmm, gathermm
from idgrec_tpu.ops.transfer import device_put_chunked
from idgrec_tpu.ops.spmm import spmm, spmm_transpose

# Dense-backend memory budget: the int8 count matrix (and its copies)
# may use at most this fraction of one device's memory. Conservative
# because the budget decision is made before the mesh is known — under
# a model-axis mesh each chip holds only 1/N rows, so sharded runs have
# extra headroom, never less.
DENSE_BUDGET_FRACTION = 0.375
# Per-chip HBM when the backend exposes no memory stats (CPU tests,
# interpreters): the v5e figure, which makes the effective default
# budget 6 GiB — the measured-safe yelp2018-scale setting.
DEFAULT_DEVICE_BYTES = 16 * 1024**3

_logger = logging.getLogger("idgrec_tpu.propagate")


def device_memory_bytes() -> int:
    """Per-device memory capacity from the live backend
    (`memory_stats()['bytes_limit']`), else DEFAULT_DEVICE_BYTES."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        limit = int(stats.get("bytes_limit", 0))
        if limit > 0:
            return limit
    except Exception:
        pass
    return DEFAULT_DEVICE_BYTES


def dense_budget() -> int:
    return int(device_memory_bytes() * DENSE_BUDGET_FRACTION)


def _dense_fits(data: Dataset, copies: int = 1, budget: int | None = None) -> bool:
    """Would `copies` padded int8 count matrices fit in the budget?

    `copies` accounts for the real storage multiple: the transpose pack
    pair of `with_transpose` (3x) and the shared binary matrix the
    per-epoch dropout path keeps alongside the main adjacency (2x)."""
    budget = dense_budget() if budget is None else budget
    need = _pad_up(data.num_users) * _pad_up(data.num_items) * copies
    fits = need <= budget
    if not fits:
        _logger.info(
            "dense adjacency (%d bytes x%d copies) exceeds budget %d; "
            "auto backend falls back to gather", need // copies, copies, budget,
        )
    return fits


# dense matrices are zero-padded to this row/col multiple so they shard
# evenly over any mesh model-axis size up to 128 (parallel/mesh.py)
_PAD = 128


def _pad_up(x: int, m: int = _PAD) -> int:
    return -(-x // m) * m


def _count_matrix_int8(data: Dataset) -> np.ndarray:
    """Int8 interaction-count matrix, zero-padded to 128-multiples in
    both dims (padding rows/cols contribute nothing to propagation and
    make the array mesh-shardable for any model-axis size ≤ 128)."""
    up, ip = _pad_up(data.num_users), _pad_up(data.num_items)
    if bool(np.all(data.csr_vals == 1)):
        # native C++ fill (data/native.py): one CSR walk writing
        # straight into the padded buffer — the numpy fancy-indexed
        # assignment below scatters through a multi-GB array at
        # amazon-book scale. Increment-based, so binary counts only.
        m = data_native.fill_count_matrix(
            data.row_ptr, data.col_idx, data.num_users, data.num_items,
            rows_out=up, cols_out=ip,
        )
        if m is not None:
            return m
    users = np.repeat(np.arange(data.num_users, dtype=np.int64), np.diff(data.row_ptr))
    m = np.zeros((up, ip), np.int8)
    m[users, data.col_idx] = np.minimum(data.csr_vals, 127).astype(np.int8)
    return m


def _pad_rows(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, rows - x.shape[0]), (0, 0)))


def _inv_pow_vec(x: np.ndarray, p: float) -> jnp.ndarray:
    return jnp.asarray(graph_lib._inv_pow(x.astype(np.float64), p), jnp.float32)


# ---------------------------------------------------------------------------
# int8-quantized propagation (opt-in): both dense-backend matmul
# directions run as s8×s8→s32 MXU products. The int8 MXU path runs at
# 2× the bf16 rate, which matters because at d=64 the bf16 matmul only
# fills half the systolic array's lanes — propagation is MXU-bound,
# not HBM-bound, once the int8 adjacency read is fused. Activations
# are quantized per-COLUMN (feature) with symmetric scales, which
# commute exactly through the contraction: (M @ q)·diag(s) = M @ (q·diag(s)).
# Gradients are straight-through: the VJP applies the same quantized
# operator with the directions swapped (fully-quantized training).
# No reference equivalent (full-precision torch.sparse.mm,
# models/LightGCN.py:44); opt-in via `propagation_quant = int8`.


def _quantize_cols(z: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-column symmetric int8 quantization: z ≈ q · diag(scale)."""
    amax = jnp.max(jnp.abs(z), axis=0)
    scale = jnp.where(amax > 0.0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.round(z / scale).astype(jnp.int8)
    return q, scale


def _qdm_impl(m: jnp.ndarray, zi: jnp.ndarray, zu: jnp.ndarray):
    qi, si = _quantize_cols(zi)
    qu, su = _quantize_cols(zu)
    yu = jnp.matmul(m, qi, preferred_element_type=jnp.int32).astype(jnp.float32) * si
    yi = jnp.matmul(m.T, qu, preferred_element_type=jnp.int32).astype(jnp.float32) * su
    return yu, yi


@jax.custom_vjp
def quant_dual_matmul(m, zi, zu):
    """(M @ q8(zi), Mᵀ @ q8(zu)) — int8 MXU both directions, f32 out.

    m int8 [U_pad, I_pad]; zi [I_pad, d]; zu [U_pad, d] f32.
    Differentiable in zi/zu (straight-through, quantized backward)."""
    return _qdm_impl(m, zi, zu)


def _qdm_fwd(m, zi, zu):
    return _qdm_impl(m, zi, zu), m


def _qdm_bwd(m, g):
    g_yu, g_yi = g
    # transpose of the bilinear structure: dzi = Mᵀ g_yu, dzu = M g_yi,
    # computed by the same quantized dual product with inputs swapped
    dzu, dzi = _qdm_impl(m, g_yi, g_yu)
    dm = np.zeros(m.shape, dtype=jax.dtypes.float0)
    return dm, dzi, dzu


quant_dual_matmul.defvjp(_qdm_fwd, _qdm_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def quant_matmul(transpose: bool, m, z):
    """Single-direction quantized product: (Mᵀ if transpose else M) @ q8(z).
    Straight-through VJP = the opposite direction, also quantized."""
    mm = m.T if transpose else m
    q, s = _quantize_cols(z)
    return jnp.matmul(mm, q, preferred_element_type=jnp.int32).astype(jnp.float32) * s


def _qm_fwd(transpose, m, z):
    return quant_matmul(transpose, m, z), m


def _qm_bwd(transpose, m, g):
    dz = quant_matmul(not transpose, m, g)
    return np.zeros(m.shape, dtype=jax.dtypes.float0), dz


quant_matmul.defvjp(_qm_fwd, _qm_bwd)


def _qfd_impl(m8, zi, zu, interpret):
    qi, si = _quantize_cols(zi)
    qu, su = _quantize_cols(zu)
    yu, yi = fusedmm.fused_adj_matmul_int8(m8, qu, qi, interpret)
    return yu * si, yi * su


def _qfd4_impl(m4, zi, zu, interpret):
    qi, si = _quantize_cols(zi)
    qu, su = _quantize_cols(zu)
    yu, yi = fusedmm.fused_adj_matmul_int4(m4, qu, qi, interpret)
    return yu * si, yi * su


# ---------------------------------------------------------------------------
# Transposed-activation quantized propagation (the fast single-chip
# path). Measured on v5e (scripts/microbench_tkernel.py): the fused
# dual application drops from 2.97 ms to 2.10 ms (int8) and from
# 2.72 ms to 1.67 ms (int4) at yelp2018 scale because both MXU dots
# run N-wide instead of N=64 (ops/fusedmm.py T-kernel rationale).
# Activations stay [d, N] across the WHOLE propagation chain
# (fused_chain_t) so the layout transposes happen once per chain, not
# once per application — and the custom VJP keeps the backward chain
# transposed too.


def _quantize_rows(zT: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row (= per-feature in [d, N] layout) symmetric int8
    quantization — the exact transpose of `_quantize_cols`: identical
    scale values, identical rounded integers."""
    amax = jnp.max(jnp.abs(zT), axis=1, keepdims=True)
    scale = jnp.where(amax > 0.0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.round(zT / scale).astype(jnp.int8)
    return q, scale  # scale [d, 1]


def _qfdt_impl(m, ziT, zuT, quant, interpret):
    qi, si = _quantize_rows(ziT)
    qu, su = _quantize_rows(zuT)
    if quant == "int4":
        yuT, yiT = fusedmm.fused_adj_matmul_int4_t(m, qu, qi, interpret)
    else:
        yuT, yiT = fusedmm.fused_adj_matmul_int8_t(m, qu, qi, interpret)
    return yuT * si, yiT * su


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def quant_fused_dual_t(m, ziT, zuT, quant="int8", interpret=False):
    """(M @ q8(zi), Mᵀ @ q8(zu)) in TRANSPOSED layout: ziT [d, I_pad],
    zuT [d, U_pad] -> (yuT [d, U_pad], yiT [d, I_pad]). Same numerics
    as quant_fused_dual/quant_fused_dual4 (bit-identical integer MACs
    and scale math); straight-through fully-quantized backward."""
    return _qfdt_impl(m, ziT, zuT, quant, interpret)


def _qfdt_fwd(m, ziT, zuT, quant, interpret):
    return _qfdt_impl(m, ziT, zuT, quant, interpret), m


def _qfdt_bwd(quant, interpret, m, g):
    g_yuT, g_yiT = g
    dzuT, dziT = _qfdt_impl(m, g_yiT, g_yuT, quant, interpret)
    return np.zeros(m.shape, dtype=jax.dtypes.float0), dziT, dzuT


quant_fused_dual_t.defvjp(_qfdt_fwd, _qfdt_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def quant_fused_dual4(m4, zi, zu, interpret=False):
    """int4 twin of quant_fused_dual: M stored nibble-packed
    (fusedmm.pack_nibbles), halving the HBM-bound adjacency read.
    Same per-column int8 activation quantization, same
    straight-through fully-quantized backward."""
    return _qfd4_impl(m4, zi, zu, interpret)


def _qfd4_fwd(m4, zi, zu, interpret):
    return _qfd4_impl(m4, zi, zu, interpret), m4


def _qfd4_bwd(interpret, m4, g):
    g_yu, g_yi = g
    dzu, dzi = _qfd4_impl(m4, g_yi, g_yu, interpret)
    return np.zeros(m4.shape, dtype=jax.dtypes.float0), dzi, dzu


quant_fused_dual4.defvjp(_qfd4_fwd, _qfd4_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def quant_fused_dual(m8, zi, zu, interpret=False):
    """(M @ q8(zi), Mᵀ @ q8(zu)) via the single-sweep int8 Pallas
    kernel (ops/fusedmm.py): one HBM read of M per application AND
    native int8 MXU dots — the fastest single-chip propagation path.
    Straight-through VJP, fully quantized backward."""
    return _qfd_impl(m8, zi, zu, interpret)


def _qfd_fwd(m8, zi, zu, interpret):
    return _qfd_impl(m8, zi, zu, interpret), m8


def _qfd_bwd(interpret, m8, g):
    g_yu, g_yi = g
    dzu, dzi = _qfd_impl(m8, g_yi, g_yu, interpret)
    return np.zeros(m8.shape, dtype=jax.dtypes.float0), dzi, dzu


quant_fused_dual.defvjp(_qfd_fwd, _qfd_bwd)


@partial(jax.tree_util.register_dataclass,
         data_fields=["m", "left_u", "left_i", "right_u", "right_i", "diag_u", "diag_i",
                      "row3"],
         meta_fields=["num_users", "num_items", "compute_dtype_name", "has_diag",
                      "quant"])
@dataclass(frozen=True)
class DenseSquareAdj:
    """Square normalized adjacency diag(L)·[[0,M],[Mᵀ,0]]·diag(R) (+ diag)."""

    m: jnp.ndarray  # int8 [U, I]
    left_u: jnp.ndarray  # f32 [U]
    left_i: jnp.ndarray  # f32 [I]
    right_u: jnp.ndarray  # f32 [U]
    right_i: jnp.ndarray  # f32 [I]
    diag_u: jnp.ndarray  # f32 [U] (zeros when no self loop)
    diag_i: jnp.ndarray  # f32 [I]
    num_users: int
    num_items: int
    compute_dtype_name: str = "bfloat16"
    has_diag: bool = False
    # optional 3-D row-gather copies (M and M^T in gathermm.pack_rows3
    # layout): enables `matmul_rows`; built with
    # build_adjacency(..., with_transpose=True)
    row3: tuple | None = None
    # "int8": both matmul directions quantize activations per-column
    # and run on the int8 MXU (2× rate at d=64); "none": exact bf16/f32
    quant: str = "none"

    @property
    def shape(self):
        n = self.num_users + self.num_items
        return (n, n)

    @property
    def supports_rows(self) -> bool:
        return self.row3 is not None

    def matmul_rows(
        self, x: jnp.ndarray, rows_u: jnp.ndarray, rows_i: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Selected rows of Â @ x: (yu[rows_u], yi[rows_i]).

        Exact slices of `matmul`'s output computed with row-gathered
        partial matmuls — O(B·N·d) instead of O(U·I·d). Used for the
        LAST propagation layer of batch-row losses (only batch rows of
        the final layer are consumed, so the full product is wasted
        work — and autodiff of this op likewise replaces the FIRST
        backward application with its partial transpose).
        """
        assert self.row3 is not None, "build the adjacency with with_transpose=True"
        m_r3, m_t3 = self.row3
        cdt = jnp.dtype(self.compute_dtype_name)
        xu, xi = x[: self.num_users], x[self.num_users :]
        zi = (self.right_i[:, None] * xi.astype(jnp.float32)).astype(cdt)
        zu = (self.right_u[:, None] * xu.astype(jnp.float32)).astype(cdt)
        # Pallas row-gather matmuls: per-row DMA + MXU (XLA's generic
        # int8 gather runs far below DMA bandwidth — ops/gathermm.py)
        interp = _bitpack_interpret()
        yu = self.left_u[rows_u, None] * gathermm.gather_matmul(
            m_r3, rows_u, zi, interp)
        yi = self.left_i[rows_i, None] * gathermm.gather_matmul(
            m_t3, rows_i, zu, interp)
        if self.has_diag:
            yu = yu + self.diag_u[rows_u, None] * xu[rows_u].astype(jnp.float32)
            yi = yi + self.diag_i[rows_i, None] * xi[rows_i].astype(jnp.float32)
        return yu.astype(x.dtype), yi.astype(x.dtype)

    def matmul(self, x: jnp.ndarray, gate: jnp.ndarray | None = None) -> jnp.ndarray:
        """Â @ x for x [U+I, d]. Optional per-node multiplicative gate
        (IMPGCN subgraphs) applied on both sides.

        Under an active mesh (parallel.mesh.use_mesh) the application
        routes through the explicit shard_map + collectives path
        (parallel/spmm_shard.py): row-sharded M, per-chip 1/N
        adjacency reads, all_gather + psum_scatter over ICI."""
        from idgrec_tpu.parallel import spmm_shard

        sharded = spmm_shard.maybe_sharded_square_matmul(self, x, gate, kind="dense")
        if sharded is not None:
            return sharded
        cdt = jnp.dtype(self.compute_dtype_name)
        xu, xi = x[: self.num_users], x[self.num_users :]
        right_u, right_i = self.right_u, self.right_i
        left_u, left_i = self.left_u, self.left_i
        if gate is not None:
            gu, gi = gate[: self.num_users], gate[self.num_users :]
            right_u, right_i = right_u * gu, right_i * gi
            left_u, left_i = left_u * gu, left_i * gi
        u_pad, i_pad = self.m.shape
        if self.quant == "int8":
            zi = _pad_rows(right_i[:, None] * xi.astype(jnp.float32), i_pad)
            zu = _pad_rows(right_u[:, None] * xu.astype(jnp.float32), u_pad)
            yu_raw, yi_raw = quant_dual_matmul(self.m, zi, zu)
            yu = left_u[:, None] * yu_raw[: self.num_users]
            yi = left_i[:, None] * yi_raw[: self.num_items]
        else:
            mm = self.m.astype(cdt)
            zi = _pad_rows((right_i[:, None] * xi.astype(jnp.float32)).astype(cdt), i_pad)
            zu = _pad_rows((right_u[:, None] * xu.astype(jnp.float32)).astype(cdt), u_pad)
            yu = left_u[:, None] * jnp.matmul(mm, zi, preferred_element_type=jnp.float32)[: self.num_users]
            yi = left_i[:, None] * jnp.matmul(mm.T, zu, preferred_element_type=jnp.float32)[: self.num_items]
        if self.has_diag:
            yu = yu + self.diag_u[:, None] * xu.astype(jnp.float32)
            yi = yi + self.diag_i[:, None] * xi.astype(jnp.float32)
        return jnp.concatenate([yu, yi], axis=0).astype(x.dtype)


@partial(jax.tree_util.register_dataclass,
         data_fields=["m", "left", "right"],
         meta_fields=["num_users", "num_items", "compute_dtype_name", "quant"])
@dataclass(frozen=True)
class DenseRectAdj:
    """Rectangular R̃ = diag(left)·M·diag(right) [U, I]."""

    m: jnp.ndarray  # int8 [U, I]
    left: jnp.ndarray  # f32 [U]
    right: jnp.ndarray  # f32 [I]
    num_users: int
    num_items: int
    compute_dtype_name: str = "bfloat16"
    quant: str = "none"

    @property
    def shape(self):
        return (self.num_users, self.num_items)

    def matmul(self, xi: jnp.ndarray) -> jnp.ndarray:
        z32 = self.right[:, None] * xi.astype(jnp.float32)
        if self.quant == "int8":
            y = quant_matmul(False, self.m, _pad_rows(z32, self.m.shape[1]))
        else:
            cdt = jnp.dtype(self.compute_dtype_name)
            z = _pad_rows(z32.astype(cdt), self.m.shape[1])
            y = jnp.matmul(self.m.astype(cdt), z, preferred_element_type=jnp.float32)
        return (self.left[:, None] * y[: self.num_users]).astype(xi.dtype)

    def t_matmul(self, xu: jnp.ndarray) -> jnp.ndarray:
        z32 = self.left[:, None] * xu.astype(jnp.float32)
        if self.quant == "int8":
            y = quant_matmul(True, self.m, _pad_rows(z32, self.m.shape[0]))
        else:
            cdt = jnp.dtype(self.compute_dtype_name)
            z = _pad_rows(z32.astype(cdt), self.m.shape[0])
            y = jnp.matmul(self.m.T.astype(cdt), z, preferred_element_type=jnp.float32)
        return (self.right[:, None] * y[: self.num_items]).astype(xu.dtype)


@partial(jax.tree_util.register_dataclass,
         data_fields=["graph"], meta_fields=[])
@dataclass(frozen=True)
class GatherSquareAdj:
    graph: SparseGraph

    @property
    def shape(self):
        return self.graph.shape

    def matmul(self, x: jnp.ndarray, gate: jnp.ndarray | None = None) -> jnp.ndarray:
        if gate is None:
            return spmm(self.graph, x)
        gated_vals = self.graph.vals * gate[self.graph.rows] * gate[self.graph.cols]
        gated = graph_lib.SparseGraph(
            rows=self.graph.rows, cols=self.graph.cols, vals=gated_vals,
            t_rows=self.graph.t_rows, t_cols=self.graph.t_cols,
            t_vals=gated_vals if self.graph.symmetric else self.graph.t_vals * gate[self.graph.t_rows] * gate[self.graph.t_cols],
            n_rows=self.graph.n_rows, n_cols=self.graph.n_cols,
            nnz=self.graph.nnz, symmetric=self.graph.symmetric,
        )
        return spmm(gated, x)


@partial(jax.tree_util.register_dataclass,
         data_fields=["graph"], meta_fields=[])
@dataclass(frozen=True)
class GatherRectAdj:
    graph: SparseGraph

    @property
    def shape(self):
        return self.graph.shape

    def matmul(self, xi: jnp.ndarray) -> jnp.ndarray:
        return spmm(self.graph, xi)

    def t_matmul(self, xu: jnp.ndarray) -> jnp.ndarray:
        return spmm_transpose(self.graph, xu)


@partial(jax.tree_util.register_dataclass,
         data_fields=["m_bin", "left_u", "left_i", "right_u", "right_i",
                      "du_rows", "du_cols", "du_vals", "di_rows", "di_cols", "di_vals"],
         meta_fields=["num_users", "num_items", "compute_dtype_name"])
@dataclass(frozen=True)
class DenseDropSquareAdj:
    """Edge-dropout adjacency for the dense backend without rebuilding
    the dense matrix each epoch: Â' = L'·(M_bin − D)·R' where M_bin is
    the SHARED binary interaction matrix (uploaded once) and D holds
    only the dropped edges (~ratio·nnz, tiny). The dropped-edge
    contribution is subtracted with a sorted segment-sum.
    """

    m_bin: jnp.ndarray  # int8 [U, I], binary, shared across epochs
    left_u: jnp.ndarray
    left_i: jnp.ndarray
    right_u: jnp.ndarray
    right_i: jnp.ndarray
    # dropped edges sorted by user (for the user-side subtraction)
    du_rows: jnp.ndarray  # int32 [Dn] user ids, sorted
    du_cols: jnp.ndarray  # int32 [Dn] item ids
    du_vals: jnp.ndarray  # f32 [Dn] 1.0 (0 padding)
    # dropped edges sorted by item (for the item-side subtraction)
    di_rows: jnp.ndarray  # int32 [Dn] item ids, sorted
    di_cols: jnp.ndarray  # int32 [Dn] user ids
    di_vals: jnp.ndarray
    num_users: int
    num_items: int
    compute_dtype_name: str = "bfloat16"

    @property
    def shape(self):
        n = self.num_users + self.num_items
        return (n, n)

    def matmul(self, x: jnp.ndarray, gate: jnp.ndarray | None = None) -> jnp.ndarray:
        assert gate is None, "gates unsupported on dropout adjacency"
        cdt = jnp.dtype(self.compute_dtype_name)
        xu, xi = x[: self.num_users], x[self.num_users :]
        zi = self.right_i[:, None] * xi.astype(jnp.float32)
        zu = self.right_u[:, None] * xu.astype(jnp.float32)
        mm = self.m_bin.astype(cdt)
        u_pad, i_pad = self.m_bin.shape
        yu = jnp.matmul(mm, _pad_rows(zi.astype(cdt), i_pad),
                        preferred_element_type=jnp.float32)[: self.num_users]
        yi = jnp.matmul(mm.T, _pad_rows(zu.astype(cdt), u_pad),
                        preferred_element_type=jnp.float32)[: self.num_items]
        # subtract dropped edges
        drop_u = jax.ops.segment_sum(
            jnp.take(zi, self.du_cols, axis=0) * self.du_vals[:, None],
            self.du_rows, num_segments=self.num_users, indices_are_sorted=True,
        )
        drop_i = jax.ops.segment_sum(
            jnp.take(zu, self.di_cols, axis=0) * self.di_vals[:, None],
            self.di_rows, num_segments=self.num_items, indices_are_sorted=True,
        )
        yu = self.left_u[:, None] * (yu - drop_u)
        yi = self.left_i[:, None] * (yi - drop_i)
        return jnp.concatenate([yu, yi], axis=0).astype(x.dtype)


@partial(jax.tree_util.register_dataclass,
         data_fields=["packed", "packed_t", "left_u", "left_i", "right_u", "right_i",
                      "du_rows", "du_cols", "du_vals", "di_rows", "di_cols", "di_vals"],
         meta_fields=["num_users", "num_items", "interpret"])
@dataclass(frozen=True)
class BitDropSquareAdj:
    """Edge-dropout adjacency over the SHARED bit-packed binary matrix:
    Â' = L'·(M − D)·R' with D the dropped edges (~ratio·nnz), subtracted
    with a sorted segment-sum after the packed sweeps (same scheme as
    `DenseDropSquareAdj`, ~10% of nnz moved host→device per epoch)."""

    packed: jnp.ndarray
    packed_t: jnp.ndarray
    left_u: jnp.ndarray
    left_i: jnp.ndarray
    right_u: jnp.ndarray
    right_i: jnp.ndarray
    du_rows: jnp.ndarray  # dropped edges sorted by user
    du_cols: jnp.ndarray
    du_vals: jnp.ndarray
    di_rows: jnp.ndarray  # dropped edges sorted by item
    di_cols: jnp.ndarray
    di_vals: jnp.ndarray
    num_users: int
    num_items: int
    interpret: bool = False

    @property
    def shape(self):
        n = self.num_users + self.num_items
        return (n, n)

    def matmul(self, x: jnp.ndarray, gate: jnp.ndarray | None = None) -> jnp.ndarray:
        assert gate is None, "gates unsupported on dropout adjacency"
        xu, xi = x[: self.num_users], x[self.num_users :]
        zu = self.right_u[:, None] * xu.astype(jnp.float32)
        zi = self.right_i[:, None] * xi.astype(jnp.float32)
        yu, yi = bitmm.bit_adj_matmul(self.packed, self.packed_t, zu, zi, self.interpret)
        drop_u = jax.ops.segment_sum(
            jnp.take(zi, self.du_cols, axis=0) * self.du_vals[:, None],
            self.du_rows, num_segments=self.num_users, indices_are_sorted=True,
        )
        drop_i = jax.ops.segment_sum(
            jnp.take(zu, self.di_cols, axis=0) * self.di_vals[:, None],
            self.di_rows, num_segments=self.num_items, indices_are_sorted=True,
        )
        yu = self.left_u[:, None] * (yu - drop_u)
        yi = self.left_i[:, None] * (yi - drop_i)
        return jnp.concatenate([yu, yi], axis=0).astype(x.dtype)


def shared_chain_matmul(m_bin: jnp.ndarray, chains, xs, compute_dtype: str = "bfloat16"):
    """ONE dual sweep of a shared binary matrix applied to k chains.

    SGL-style models propagate several independent chains per step
    whose operators all factor over the SAME binary interaction matrix
    (clean graph + edge-dropout views: Â_k = diag(L_k)·(M − D_k)·diag(R_k)
    with tiny per-view dropped-edge sets D_k — tools.py:67-92). Since
    the step is HBM-bound on reading M, feature-batching the chains
    into one [N, k·d] matmul divides adjacency traffic by k and runs
    the MXU at k·d width; the per-view corrections are sorted
    segment-sums over ~ratio·nnz dropped edges (cheap).

    chains: DenseSquareAdj (no self-loop diag) or DenseDropSquareAdj
    instances whose scales/drop-lists apply over `m_bin`; xs: matching
    [num_users+num_items, d] inputs. Returns the per-chain outputs —
    numerically equal (per dtype policy) to [c.matmul(x) for c, x ...].
    """
    cdt = jnp.dtype(compute_dtype)
    nu, ni = chains[0].num_users, chains[0].num_items
    u_pad, i_pad = m_bin.shape
    zi_blocks, zu_blocks = [], []
    for c, x in zip(chains, xs):
        xu, xi = x[:nu], x[nu:]
        zi_blocks.append(c.right_i[:, None] * xi.astype(jnp.float32))
        zu_blocks.append(c.right_u[:, None] * xu.astype(jnp.float32))
    zi = _pad_rows(jnp.concatenate(zi_blocks, axis=1), i_pad).astype(cdt)
    zu = _pad_rows(jnp.concatenate(zu_blocks, axis=1), u_pad).astype(cdt)
    mm = m_bin.astype(cdt)
    yu_all = jnp.matmul(mm, zi, preferred_element_type=jnp.float32)[:nu]
    yi_all = jnp.matmul(mm.T, zu, preferred_element_type=jnp.float32)[:ni]
    outs = []
    d = xs[0].shape[1]
    for k, (c, x) in enumerate(zip(chains, xs)):
        yu = yu_all[:, k * d : (k + 1) * d]
        yi = yi_all[:, k * d : (k + 1) * d]
        if isinstance(c, (DenseDropSquareAdj, BitDropSquareAdj)):
            drop_u = jax.ops.segment_sum(
                jnp.take(zi_blocks[k], c.du_cols, axis=0) * c.du_vals[:, None],
                c.du_rows, num_segments=nu, indices_are_sorted=True,
            )
            drop_i = jax.ops.segment_sum(
                jnp.take(zu_blocks[k], c.di_cols, axis=0) * c.di_vals[:, None],
                c.di_rows, num_segments=ni, indices_are_sorted=True,
            )
            yu = yu - drop_u
            yi = yi - drop_i
        yu = c.left_u[:, None] * yu
        yi = c.left_i[:, None] * yi
        outs.append(jnp.concatenate([yu, yi], axis=0).astype(x.dtype))
    return outs


def build_binary_count_matrix(data: Dataset) -> jnp.ndarray:
    """Shared binary int8 [U, I] interaction matrix for dropout graphs
    (the reference's augmentation is binary — tools.py:70,80)."""
    m = _count_matrix_int8(data)
    return device_put_chunked(np.minimum(m, 1))


@partial(jax.tree_util.register_dataclass,
         data_fields=["packed", "packed_t", "left_u", "left_i", "right_u", "right_i",
                      "diag_u", "diag_i"],
         meta_fields=["num_users", "num_items", "has_diag", "interpret"])
@dataclass(frozen=True)
class BitSquareAdj:
    """Square normalized adjacency diag(L)·[[0,M],[Mᵀ,0]]·diag(R)
    (+ optional diag) with binary M stored bit-packed; both propagation
    directions run as one Pallas sweep each (ops/bitmm.py) and the
    backward pass reuses the same kernels with swapped cotangents."""

    packed: jnp.ndarray    # int8 [U_pad/8, I_pad] = pack_rows(M)
    packed_t: jnp.ndarray  # int8 [I_pad'/8, U_pad'] = pack_rows(Mᵀ)
    left_u: jnp.ndarray    # f32 [U]
    left_i: jnp.ndarray    # f32 [I]
    right_u: jnp.ndarray   # f32 [U]
    right_i: jnp.ndarray   # f32 [I]
    diag_u: jnp.ndarray    # f32 [U] (zeros when no self loop)
    diag_i: jnp.ndarray    # f32 [I]
    num_users: int
    num_items: int
    has_diag: bool = False
    interpret: bool = False  # run kernels interpreted (CPU tests)

    @property
    def shape(self):
        n = self.num_users + self.num_items
        return (n, n)

    def matmul(self, x: jnp.ndarray, gate: jnp.ndarray | None = None) -> jnp.ndarray:
        """Â @ x for x [U+I, d]; optional per-node multiplicative gate
        (IMPGCN subgraphs) applied on both sides."""
        xu, xi = x[: self.num_users], x[self.num_users :]
        right_u, right_i = self.right_u, self.right_i
        left_u, left_i = self.left_u, self.left_i
        if gate is not None:
            gu, gi = gate[: self.num_users], gate[self.num_users :]
            right_u, right_i = right_u * gu, right_i * gi
            left_u, left_i = left_u * gu, left_i * gi
        zu = right_u[:, None] * xu.astype(jnp.float32)
        zi = right_i[:, None] * xi.astype(jnp.float32)
        yu, yi = bitmm.bit_adj_matmul(self.packed, self.packed_t, zu, zi, self.interpret)
        yu = left_u[:, None] * yu
        yi = left_i[:, None] * yi
        if self.has_diag:
            yu = yu + self.diag_u[:, None] * xu.astype(jnp.float32)
            yi = yi + self.diag_i[:, None] * xi.astype(jnp.float32)
        return jnp.concatenate([yu, yi], axis=0).astype(x.dtype)


@partial(jax.tree_util.register_dataclass,
         data_fields=["m8", "left_u", "left_i", "right_u", "right_i", "diag_u", "diag_i"],
         meta_fields=["num_users", "num_items", "has_diag", "interpret", "quant"])
@dataclass(frozen=True)
class FusedSquareAdj:
    """Square normalized adjacency over int8 M with BOTH directions
    computed by one Pallas sweep of M per application (ops/fusedmm.py):
    halves adjacency HBM traffic vs. the two-matmul dense backend."""

    m8: jnp.ndarray       # int8 [U_pad, I_pad] from fusedmm.pad_matrix
    left_u: jnp.ndarray   # f32 [U]
    left_i: jnp.ndarray   # f32 [I]
    right_u: jnp.ndarray  # f32 [U]
    right_i: jnp.ndarray  # f32 [I]
    diag_u: jnp.ndarray   # f32 [U]
    diag_i: jnp.ndarray   # f32 [I]
    num_users: int
    num_items: int
    has_diag: bool = False
    interpret: bool = False
    quant: str = "none"

    @property
    def shape(self):
        n = self.num_users + self.num_items
        return (n, n)

    @property
    def padded_shape(self) -> tuple[int, int]:
        """Logical padded [U_pad, I_pad] — for int4 the stored matrix
        is nibble-packed at half the column width."""
        u_pad, cols = self.m8.shape
        return (u_pad, 2 * cols if self.quant == "int4" else cols)

    def matmul(self, x: jnp.ndarray, gate: jnp.ndarray | None = None) -> jnp.ndarray:
        from idgrec_tpu.parallel import spmm_shard

        sharded = spmm_shard.maybe_sharded_square_matmul(self, x, gate, kind="fused")
        if sharded is not None:
            return sharded
        xu, xi = x[: self.num_users], x[self.num_users :]
        right_u, right_i = self.right_u, self.right_i
        left_u, left_i = self.left_u, self.left_i
        if gate is not None:
            gu, gi = gate[: self.num_users], gate[self.num_users :]
            right_u, right_i = right_u * gu, right_i * gi
            left_u, left_i = left_u * gu, left_i * gi
        zu = right_u[:, None] * xu.astype(jnp.float32)
        zi = right_i[:, None] * xi.astype(jnp.float32)
        if self.quant in ("int8", "int4"):
            u_pad, i_pad = self.padded_shape
            zu_p = _pad_rows(zu, u_pad)
            zi_p = _pad_rows(zi, i_pad)
            d = x.shape[1]
            # wide activations (feature-batched chains, d > 64) fit the
            # single-panel kernels under the measured v5e allowance
            # (fusedmm.yi_budget) — EXCEPT the untransposed int4 small
            # kernel, which does not compile at d=192 on v5e; wide int4
            # routes through the T-kernel with boundary transposes
            # (bit-identical results, ~0.6 ms of transpose traffic vs
            # the XLA fallback's per-application nibble unpack)
            kernel_fits = (
                i_pad * d * 4 <= fusedmm.yi_budget(d)  # single-panel
                or (
                    i_pad % fusedmm.PANEL == 0  # TI-padded builds have no panel path
                    and u_pad * d * 4 <= fusedmm.MAX_YU_VMEM_BYTES  # panelized
                )
            )
            # int4 dispatch: the tuned small kernel at d <= 64; wide
            # activations go through the T-kernel (the untransposed
            # int4 small kernel does not compile at d=192 on v5e, and
            # int4 matrices are PACK_TILE-padded, not PANEL-padded, so
            # the panelized path only applies when built for it)
            int4_small = i_pad * d * 4 <= fusedmm.MAX_YI_VMEM_BYTES
            int4_panel = (
                i_pad % fusedmm.PANEL == 0
                and u_pad * d * 4 <= fusedmm.MAX_YU_VMEM_BYTES
            )
            if self.quant == "int4" and not int4_small and (
                i_pad * d * 4 <= fusedmm.yi_budget(d)
            ):
                yuT, yiT = quant_fused_dual_t(
                    self.m8, zi_p.T, zu_p.T, "int4", self.interpret
                )
                yu, yi = yuT.T, yiT.T
            elif self.quant == "int4" and (int4_small or int4_panel):
                yu, yi = quant_fused_dual4(self.m8, zi_p, zu_p, self.interpret)
            elif self.quant == "int8" and kernel_fits:
                yu, yi = quant_fused_dual(self.m8, zi_p, zu_p, self.interpret)
            else:  # both accumulators over VMEM budget: XLA int8 matmuls
                if self.quant == "int4":
                    # trace-time warning (fires once per compile): the
                    # fallback re-unpacks the nibble matrix EVERY
                    # application, so int4's HBM saving is gone — int8
                    # storage would be strictly better in this regime
                    import logging

                    logging.getLogger("idgrec_tpu").warning(
                        "int4 adjacency exceeds both VMEM accumulator "
                        "budgets (i_pad*d and u_pad*d too large) — "
                        "falling back to per-application nibble unpack; "
                        "prefer compute_dtype = int8 at this scale"
                    )
                m8 = (fusedmm.unpack_nibbles(self.m8)
                      if self.quant == "int4" else self.m8)
                yu, yi = quant_dual_matmul(m8, zi_p, zu_p)
            yu, yi = yu[: self.num_users], yi[: self.num_items]
        elif self.m8.shape[1] * x.shape[1] * 4 > fusedmm.MAX_YI_VMEM_BYTES:
            # bf16 kernel's yi scratch would overflow VMEM (wide x from
            # multi-chain feature batching, or a very wide catalog):
            # two XLA matmuls over the same padded matrix
            u_pad, i_pad = self.m8.shape
            mm = self.m8.astype(jnp.bfloat16)
            yu = jnp.matmul(mm, _pad_rows(zi.astype(jnp.bfloat16), i_pad),
                            preferred_element_type=jnp.float32)[: self.num_users]
            yi = jnp.matmul(mm.T, _pad_rows(zu.astype(jnp.bfloat16), u_pad),
                            preferred_element_type=jnp.float32)[: self.num_items]
        else:
            yu, yi = fusedmm.fused_adj_matmul(self.m8, zu, zi, self.interpret)
        yu = left_u[:, None] * yu
        yi = left_i[:, None] * yi
        if self.has_diag:
            yu = yu + self.diag_u[:, None] * xu.astype(jnp.float32)
            yi = yi + self.diag_i[:, None] * xi.astype(jnp.float32)
        return jnp.concatenate([yu, yi], axis=0).astype(x.dtype)


def supports_chain_t(graph, d: int | None = None) -> bool:
    """True when `fused_chain_t` applies: quantized fused backend with
    no active model-parallel mesh (the sharded path has its own
    per-shard kernels and collective structure). When the feature width
    ``d`` is given, additionally require the T-kernel accumulators to
    fit VMEM (fusedmm.tdual_fits) — very wide models (RecDCL's
    reference d=2048) must decline here and take the per-application
    XLA fallback instead of tripping the kernel's budget assert."""
    if not isinstance(graph, FusedSquareAdj) or graph.quant not in ("int8", "int4"):
        return False
    u_pad, i_pad = graph.padded_shape
    col_mult = fusedmm.PACK_TILE if graph.quant == "int4" else fusedmm.TI
    if i_pad % col_mult != 0 or fusedmm.pick_row_tile(u_pad) is None:
        return False
    if d is not None and not fusedmm.tdual_fits(u_pad, i_pad, d, graph.quant):
        return False
    from idgrec_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_active_mesh()
    return mesh is None or mesh.shape.get("model", 1) == 1


def fused_chain_t(
    adj: "FusedSquareAdj",
    emb0: jnp.ndarray,
    num_layers: int,
    include_layer0: bool = True,
    reduce: str | None = "mean",
    activation=None,
    seed_users_from_items: bool = False,
):
    """K applications of Â in TRANSPOSED [d, N] layout with one layout
    transpose at each end — numerically identical (bit-exact) to
    ``num_layers`` repeated ``adj.matmul`` calls on the quantized fused
    backend, but every application runs the N-wide T-kernel
    (~1.6x faster per application at yelp2018 scale, and the custom
    VJP keeps the whole backward chain transposed too).

    reduce: 'mean' | 'sum' over the layer stack, or None to return the
    per-layer list in [N, d] layout (lightgcn_layer_outputs contract).
    activation: optional elementwise fn applied after each application
    (EGCF's tanh, models/EGCF.py:67-84 — elementwise ops are
    layout-invariant).
    seed_users_from_items: EGCF parallel-mode user seeding
    (models/EGCF.py:67-72) INSIDE the T layout: emb0's user rows must
    be zero; before the counted layers, one extra dual application
    sets hu = activation(lu·(M @ (ri·hi))) while hi is RESET to the
    item embeddings (Â·[0;E_i] has a zero item side). Numerically
    identical to seeding via ``adj.matmul`` on the concatenated
    [0; E_i] (same per-feature quantization, same scale order), but
    the seed rides the same N-wide T-kernel as the chain instead of
    two untransposed per-application sweeps.
    """
    nu, ni = adj.num_users, adj.num_items
    u_pad, i_pad = adj.padded_shape
    xT = emb0.astype(jnp.float32).T  # [d, nu+ni]
    hu = jnp.pad(xT[:, :nu], ((0, 0), (0, u_pad - nu)))
    hi = jnp.pad(xT[:, nu:], ((0, 0), (0, i_pad - ni)))
    ru = jnp.pad(adj.right_u, (0, u_pad - nu))[None, :]
    ri = jnp.pad(adj.right_i, (0, i_pad - ni))[None, :]
    lu = jnp.pad(adj.left_u, (0, u_pad - nu))[None, :]
    li = jnp.pad(adj.left_i, (0, i_pad - ni))[None, :]
    if adj.has_diag:
        du = jnp.pad(adj.diag_u, (0, u_pad - nu))[None, :]
        di = jnp.pad(adj.diag_i, (0, i_pad - ni))[None, :]

    if seed_users_from_items:
        assert activation is not None, "seeding is defined with an activation"
        assert not adj.has_diag, "seed semantics assume no self-loop diag"
        ziT = ri * hi
        zuT = ru * hu  # zeros — quantizes to zeros (scale 1), yiT = 0
        yuT, _ = quant_fused_dual_t(adj.m8, ziT, zuT, adj.quant, adj.interpret)
        hu = activation(lu * yuT)
        # hi stays the item embeddings: tanh(0) + E_i (item side of
        # the reference's h0 after seeding)

    layers = [(hu, hi)] if (include_layer0 or reduce is None) else []
    for _ in range(num_layers):
        ziT = ri * hi
        zuT = ru * hu
        yuT, yiT = quant_fused_dual_t(adj.m8, ziT, zuT, adj.quant, adj.interpret)
        # scale order matches FusedSquareAdj.matmul exactly:
        # left * (raw * s) — keeps f32 results bit-identical
        nhu = lu * yuT
        nhi = li * yiT
        if adj.has_diag:
            nhu = nhu + du * hu
            nhi = nhi + di * hi
        if activation is not None:
            nhu = activation(nhu)
            nhi = activation(nhi)
        hu, hi = nhu, nhi
        layers.append((hu, hi))

    def _back(pair):
        cu, ci = pair
        return jnp.concatenate([cu[:, :nu], ci[:, :ni]], axis=1).T

    if reduce is None:
        outs = [_back(p) for p in layers]
        if not include_layer0:
            outs = outs[1:]
        return outs
    if reduce not in ("mean", "sum"):
        raise ValueError(f"unknown reduce {reduce!r}")
    # running accumulation, equivalent to stack+reduce: measured on the
    # v5e (scripts/profile_step_other.py) XLA fuses either form to the
    # same time — this one just never names the [L, d, N] stack.
    # Summation order (((h0+h1)+h2)+h3) matches jnp.sum's sequential
    # reduction over axis 0, so per-app/chain exactness tests still pin
    cu, ci = layers[0]
    for pu, pi in layers[1:]:
        cu = cu + pu
        ci = ci + pi
    if reduce == "mean":
        # divide (not multiply-by-reciprocal): bit-matches jnp.mean's
        # lowering for layer counts whose reciprocal is inexact (L=3)
        n = jnp.float32(len(layers))
        cu, ci = cu / n, ci / n
    return _back((cu, ci)).astype(emb0.dtype)


def supports_chain_views_t(graph, n_chains: int, d: int) -> bool:
    """True when `fused_chain_views_t` applies: `supports_chain_t`
    conditions plus the [n_chains*d, I_pad] yi accumulator fitting the
    wide VMEM allowance (fusedmm.yi_budget)."""
    if not supports_chain_t(graph) or graph.has_diag:
        return False
    _, i_pad = graph.padded_shape
    wd = n_chains * d
    return i_pad * wd * 4 <= fusedmm.yi_budget(wd)


def fused_chain_views_t(
    adj: "FusedSquareAdj",
    view_lists,
    emb0: jnp.ndarray,
    num_layers: int,
    include_layer0: bool = True,
    reduce: str = "mean",
):
    """Quantized multi-chain propagation: the clean chain plus k-1
    edge-dropout view chains share ONE fused T-kernel sweep of
    ``adj.m8`` per layer, feature-batched as [k*d, N] activations.

    SGL-style models (reference models/SGL.py:60-89) propagate 3
    chains per step whose operators all factor over the SAME binary
    interaction matrix: Â_v = diag(L_v)·(M − D_v)·diag(R_v) with tiny
    per-view dropped-edge sets D_v (tools.py:67-92). The step is
    HBM-bound on reading M, so batching divides adjacency traffic by k
    (measured on v5e, scripts/microbench_wide.py: one int8 d=192 sweep
    = 2.89 ms vs 3 × 2.02 ms separate). Per-view corrections subtract
    the dropped edges with sorted segment-sums over ~ratio·nnz entries
    on the UNQUANTIZED right-scaled activations (same semantics as
    `shared_chain_matmul`); the kernel's straight-through VJP keeps the
    whole backward chain batched and transposed too.

    Requires binary interaction counts — ``adj.m8`` must BE the shared
    binary matrix the views factor over (callers check
    ``np.all(data.csr_vals == 1)``) — and ``has_diag == False``.

    view_lists: one tuple per view chain, containing the view adjacency
    for each layer ('ed': a 1-tuple shared across layers; 'rw': one per
    layer — SGL.py:130-143). Entries need only carry left_u/left_i/
    right_u/right_i and the sorted drop lists (DenseDropSquareAdj
    fields). Returns [clean, view_1, ..., view_{k-1}] in [N, d] layout;
    the clean output is bit-identical to `fused_chain_t`.
    """
    assert not adj.has_diag, "chain-views path assumes no self-loop diag"
    nu, ni = adj.num_users, adj.num_items
    u_pad, i_pad = adj.padded_shape
    d = emb0.shape[1]
    k = 1 + len(view_lists)

    def pad_u(v):
        return jnp.pad(v, (0, u_pad - nu))[None, :]

    def pad_i(v):
        return jnp.pad(v, (0, i_pad - ni))[None, :]

    xT = emb0.astype(jnp.float32).T
    hu0 = jnp.pad(xT[:, :nu], ((0, 0), (0, u_pad - nu)))
    hi0 = jnp.pad(xT[:, nu:], ((0, 0), (0, i_pad - ni)))
    hus, his = [hu0] * k, [hi0] * k
    # per-chain layer stacks, reduced exactly like fused_chain_t
    # (jnp.mean over the stacked layers) so the clean chain stays
    # BIT-identical to the single-chain path
    layer_u = [[h] for h in hus] if include_layer0 else [[] for _ in range(k)]
    layer_i = [[h] for h in his] if include_layer0 else [[] for _ in range(k)]

    for layer in range(num_layers):
        views = [vl[layer % len(vl)] for vl in view_lists]
        chain_r = [(adj.right_u, adj.right_i)] + [
            (v.right_u, v.right_i) for v in views
        ]
        chain_l = [(adj.left_u, adj.left_i)] + [
            (v.left_u, v.left_i) for v in views
        ]
        zi_list = [pad_i(ri) * hi for (_, ri), hi in zip(chain_r, his)]
        zu_list = [pad_u(ru) * hu for (ru, _), hu in zip(chain_r, hus)]
        yuT, yiT = quant_fused_dual_t(
            adj.m8,
            jnp.concatenate(zi_list, axis=0),
            jnp.concatenate(zu_list, axis=0),
            adj.quant,
            adj.interpret,
        )
        hus, his = [], []
        for c in range(k):
            yu = yuT[c * d : (c + 1) * d]
            yi = yiT[c * d : (c + 1) * d]
            if c > 0:
                v = views[c - 1]
                gu = jnp.take(zi_list[c], v.du_cols, axis=1) * v.du_vals[None, :]
                corr_u = jax.ops.segment_sum(
                    gu.T, v.du_rows, num_segments=nu, indices_are_sorted=True
                ).T
                gi = jnp.take(zu_list[c], v.di_cols, axis=1) * v.di_vals[None, :]
                corr_i = jax.ops.segment_sum(
                    gi.T, v.di_rows, num_segments=ni, indices_are_sorted=True
                ).T
                yu = yu - jnp.pad(corr_u, ((0, 0), (0, u_pad - nu)))
                yi = yi - jnp.pad(corr_i, ((0, 0), (0, i_pad - ni)))
            lu, li = chain_l[c]
            hus.append(pad_u(lu) * yu)
            his.append(pad_i(li) * yi)
        for c in range(k):
            layer_u[c].append(hus[c])
            layer_i[c].append(his[c])

    if reduce not in ("mean", "sum"):
        raise ValueError(f"unknown reduce {reduce!r}")
    outs = []
    for c in range(k):
        # combine with the SAME sequential accumulation (and divide) as
        # fused_chain_t so the clean chain stays BIT-identical to the
        # single-chain path for any layer count
        au, ai = layer_u[c][0], layer_i[c][0]
        for pu, pi in zip(layer_u[c][1:], layer_i[c][1:]):
            au = au + pu
            ai = ai + pi
        if reduce == "mean":
            n = jnp.float32(len(layer_u[c]))
            au, ai = au / n, ai / n
        outs.append(
            jnp.concatenate([au[:, :nu], ai[:, :ni]], axis=1).T.astype(emb0.dtype)
        )
    return outs


@partial(jax.tree_util.register_dataclass,
         data_fields=["packed", "packed_t", "left", "right"],
         meta_fields=["num_users", "num_items", "interpret"])
@dataclass(frozen=True)
class BitRectAdj:
    """Rectangular R̃ = diag(left)·M·diag(right) [U, I], bit-packed."""

    packed: jnp.ndarray
    packed_t: jnp.ndarray
    left: jnp.ndarray   # f32 [U]
    right: jnp.ndarray  # f32 [I]
    num_users: int
    num_items: int
    interpret: bool = False

    @property
    def shape(self):
        return (self.num_users, self.num_items)

    def matmul(self, xi: jnp.ndarray) -> jnp.ndarray:
        z = self.right[:, None] * xi.astype(jnp.float32)
        y = bitmm.bit_matmul(self.packed, self.packed_t, z, self.num_users, self.interpret)
        return (self.left[:, None] * y).astype(xi.dtype)

    def t_matmul(self, xu: jnp.ndarray) -> jnp.ndarray:
        z = self.left[:, None] * xu.astype(jnp.float32)
        y = bitmm.bit_matmul(self.packed_t, self.packed, z, self.num_items, self.interpret)
        return (self.right[:, None] * y).astype(xu.dtype)


# ---------------------------------------------------------------------------
# Builders


def _is_binary(data: Dataset) -> bool:
    return bool(np.all(data.csr_vals == 1))


def _split_quant(compute_dtype: str) -> tuple[str, str]:
    """('int8'/'int4' policy) -> (matmul dtype for non-quant paths,
    quant mode). int4 = the int8 activation quantization with the
    MATRIX nibble-packed (fusedmm.pack_nibbles) — identical numerics
    to int8 (counts are exact in 4 bits), half the adjacency HBM."""
    if compute_dtype in ("int8", "int4"):
        return "bfloat16", compute_dtype
    return compute_dtype, "none"


def resolve_backend(data: Dataset, backend: str, copies: int = 1,
                    compute_dtype: str | None = None) -> str:
    """Public 'auto' resolution. Models that keep SEVERAL dense
    matrices resident (e.g. SGL: main adjacency + the dropout-shared
    binary matrix) must resolve ONCE with the total copy count and pass
    the concrete backend to every builder — resolving independently per
    builder could split the selection (main dense, dropout gather) and
    break invariants like SGL's shared-chain batching.

    When ``compute_dtype`` is given, the quantized-mode upgrades are
    applied here too (single owner — build_adjacency and model-side
    resolution must never disagree): auto-selected dense upgrades to
    the single-sweep fused Pallas kernel for any quantized mode (one M
    read + int8 MXU dots; under a mesh the explicit shard_map path
    runs the same kernel per row shard), and int4 upgrades
    unconditionally (the nibble-packed matrix only has fused kernels).
    """
    requested = backend
    backend = _select_backend(data, backend, copies=copies)
    if compute_dtype is not None:
        _, quant = _split_quant(compute_dtype)
        if quant != "none" and backend == "dense" and (
            requested == "auto" or quant == "int4"
        ):
            backend = "fused"
    return backend


def _select_backend(data: Dataset, backend: str, copies: int = 1) -> str:
    """'auto' picks dense when `copies` int8 count matrices fit in the
    device-memory-derived budget (`dense_budget()`), else gather.

    'bitpack' (8× smaller storage) is opt-in: measured on a v5e chip the
    VPU bit-unpack (~3 vector ops per unpacked element ≈ 4ms per full
    sweep at yelp2018 scale) costs more than the int8 HBM reads it
    saves (~1.6ms per sweep), so it only wins when HBM capacity — not
    bandwidth — is the binding constraint (graphs ~8× over the dense
    budget).
    """
    if backend == "auto":
        return "dense" if _dense_fits(data, copies=copies) else "gather"
    if backend not in ("bitpack", "dense", "fused", "gather"):
        raise ValueError(f"unknown propagation backend {backend!r}")
    return backend


def _pack_pair(data: Dataset) -> tuple[jnp.ndarray, jnp.ndarray]:
    m = _count_matrix_int8(data)
    p, pt = bitmm.pack_pair(m)
    return device_put_chunked(p), device_put_chunked(pt)


def _bitpack_interpret() -> bool:
    """Pallas kernels run interpreted off-TPU (CPU tests / dryrun)."""
    return fusedmm.interpret_default()


def build_adjacency(
    data: Dataset,
    variant: str = "sym",
    backend: str = "auto",
    alpha: float | None = None,
    beta: float | None = None,
    compute_dtype: str = "bfloat16",
    with_transpose: bool = False,
    emb_size: int | None = None,
):
    """Normalized square adjacency ops.

    variant: 'sym' (data_graph.py:33), 'self' (data_graph.py:7),
    'gen' with (alpha, beta) (LightGCN_pp.py:42).

    with_transpose (dense backend): also store Mᵀ so `matmul_rows`
    (batch-row partial propagation) is available — costs one extra
    int8 copy of the matrix in HBM.

    compute_dtype: 'bfloat16' (default), 'float32' (full precision),
    or 'int8' (dense backend only: per-column-quantized activations on
    the int8 MXU, straight-through gradients — see quant_dual_matmul).

    emb_size: when given, quantized fused matrices whose single-panel
    kernel fits the VMEM budget at this width are padded to TI
    multiples instead of PANEL — at yelp2018 scale PANEL padding adds
    2,560 pure-zero item columns (6.7% wasted HBM + MXU per sweep).
    """
    full_dtype = compute_dtype
    compute_dtype, quant = _split_quant(compute_dtype)
    # with_transpose stores M plus the 3-byte-packed row pair (~2x M);
    # resolve_backend owns the quantized-mode upgrades (auto->fused,
    # int4->fused) so model-side resolution can never disagree
    backend = resolve_backend(
        data, backend, copies=3 if with_transpose else 1,
        compute_dtype=full_dtype,
    )
    if quant != "none":
        if backend not in ("dense", "fused"):
            raise ValueError(
                f"compute_dtype = {quant} requires the dense or fused backend"
            )
        if backend == "fused" and with_transpose:
            # FusedSquareAdj has no matmul_rows/row3 pack — the caller's
            # batch-rows optimization silently degrades to full-width
            # products if we stay quiet about it
            import logging

            logging.getLogger("idgrec_tpu").warning(
                "with_transpose (batch-rows partial propagation) is not "
                "available on the quantized fused backend — full-width "
                "products will be used; set compute_dtype = bfloat16 to "
                "keep matmul_rows"
            )
    if backend == "gather":
        if variant == "sym":
            return GatherSquareAdj(graph_lib.normalized_adjacency(data))
        if variant == "self":
            return GatherSquareAdj(graph_lib.normalized_adjacency_with_self(data))
        if variant == "gen":
            return GatherSquareAdj(
                graph_lib.generalized_normalized_adjacency(data, alpha, beta)
            )
        raise ValueError(variant)

    du, di = graph_lib._degrees(data)
    nu, ni = data.num_users, data.num_items
    zeros_u = jnp.zeros(nu, jnp.float32)
    zeros_i = jnp.zeros(ni, jnp.float32)
    if variant == "sym":
        lu, li = _inv_pow_vec(du, 0.5), _inv_pow_vec(di, 0.5)
        ru, ri = lu, li
        diag_u, diag_i, has_diag = zeros_u, zeros_i, False
    elif variant == "self":
        lu, li = _inv_pow_vec(du + 1.0, 0.5), _inv_pow_vec(di + 1.0, 0.5)
        ru, ri = lu, li
        diag_u = jnp.asarray(1.0 / (du + 1.0), jnp.float32)
        diag_i = jnp.asarray(1.0 / (di + 1.0), jnp.float32)
        has_diag = True
    elif variant == "gen":
        lu, li = _inv_pow_vec(du, alpha), _inv_pow_vec(di, alpha)
        ru, ri = _inv_pow_vec(du, beta), _inv_pow_vec(di, beta)
        diag_u, diag_i, has_diag = zeros_u, zeros_i, False
    else:
        raise ValueError(variant)

    if backend == "bitpack":
        if not _is_binary(data):
            raise ValueError("bitpack backend requires binary interaction counts")
        p, pt = _pack_pair(data)
        return BitSquareAdj(p, pt, lu, li, ru, ri, diag_u, diag_i,
                            nu, ni, has_diag, _bitpack_interpret())
    if backend == "fused":
        # int4's nibble layout is PACK_TILE-granular; int8 kernels are
        # TI-granular. PANEL only when the panelized (big-graph) kernel
        # will run — its grid must divide, and padding to PANEL when the
        # single-panel kernel fits would be 4095 columns of pure waste.
        fine_mult = fusedmm.PACK_TILE if quant == "int4" else fusedmm.TI
        if quant == "none" or (
            emb_size is not None
            and fusedmm.fused_fits(data.num_items, emb_size, fine_mult)
        ):
            item_mult = fine_mult
        else:
            item_mult = fusedmm.PANEL
        row_mult = 2048 if quant == "int4" else fusedmm.TU
        m_np = fusedmm.pad_matrix(_count_matrix_int8(data), item_mult,
                                  row_multiple=row_mult)
        if quant == "int4":
            if int(m_np.max(initial=0)) > fusedmm.NIBBLE_MAX:
                raise ValueError(
                    "compute_dtype = int4 requires interaction counts "
                    f"<= {fusedmm.NIBBLE_MAX} (got {int(m_np.max())}); "
                    "use int8"
                )
            m_np = fusedmm.pack_nibbles(m_np)
        m8 = device_put_chunked(m_np)
        return FusedSquareAdj(m8, lu, li, ru, ri, diag_u, diag_i,
                              nu, ni, has_diag, _bitpack_interpret(), quant)
    m_np = _count_matrix_int8(data)
    m = device_put_chunked(m_np)
    row3 = None
    if with_transpose:
        row3 = (
            device_put_chunked(gathermm.pack_rows3(m_np)),
            device_put_chunked(gathermm.pack_rows3(np.ascontiguousarray(m_np.T))),
        )
    return DenseSquareAdj(m, lu, li, ru, ri, diag_u, diag_i, nu, ni,
                          compute_dtype, has_diag, row3, quant)


def build_rect_adjacency(
    data: Dataset, backend: str = "auto", compute_dtype: str = "bfloat16"
):
    """Rectangular R̃ = Du^-1/2 · R · Di^-1/2 ops (data_graph.py:58)."""
    compute_dtype, quant = _split_quant(compute_dtype)
    # rectangular adjacencies have no packed kernel; int4 runs the
    # int8 quantized path (identical numerics — nibble packing is a
    # storage optimization, not a precision change)
    quant = "int8" if quant == "int4" else quant
    if backend == "fused":
        # no single-sweep kernel exists for the rectangular shape — be
        # explicit rather than silently building dense (the square
        # builder's 'fused' means something real; here it would not)
        raise ValueError(
            "backend 'fused' applies to the square adjacency only; "
            "rectangular R̃ supports auto|dense|gather|bitpack"
        )
    backend = _select_backend(data, backend)
    if quant != "none" and backend != "dense":
        raise ValueError("compute_dtype = int8 requires the dense backend")
    if backend == "gather":
        return GatherRectAdj(graph_lib.normalized_rectangular(data))
    du, di = graph_lib._degrees(data)
    if backend == "bitpack":
        if not _is_binary(data):
            raise ValueError("bitpack backend requires binary interaction counts")
        p, pt = _pack_pair(data)
        return BitRectAdj(
            p, pt, _inv_pow_vec(du, 0.5), _inv_pow_vec(di, 0.5),
            data.num_users, data.num_items, _bitpack_interpret(),
        )
    m = device_put_chunked(_count_matrix_int8(data))
    return DenseRectAdj(
        m, _inv_pow_vec(du, 0.5), _inv_pow_vec(di, 0.5),
        data.num_users, data.num_items, compute_dtype, quant,
    )


def build_dropout_shared(data: Dataset, backend: str = "auto"):
    """Per-model shared state for `build_dropout_adjacency` (uploaded
    once, reused every epoch): the binary matrix for 'dense', the
    packed pair for 'bitpack', None for 'gather'."""
    # the shared binary matrix lives alongside the model's main
    # adjacency for the whole run -> 2 dense copies must fit
    backend = _select_backend(data, backend, copies=2)
    if backend in ("dense", "fused"):
        # the dropout-correction path runs on the dense binary matrix
        return build_binary_count_matrix(data)
    if backend == "bitpack":
        return _pack_pair(data)
    return None


def build_dropout_adjacency(
    data: Dataset, drop_ratio: float, np_rng: np.random.Generator,
    backend: str = "auto", compute_dtype: str = "bfloat16",
    m_bin=None,
):
    """SGL-style per-epoch edge-dropout adjacency (tools.py:67-92):
    keep (1-ratio)·E unique edges, renormalize symmetrically. Shapes and
    pytree structure are stable across epochs for all backends.

    For the dense/bitpack backends, pass a shared ``m_bin`` from
    `build_dropout_shared` so only the dropped-edge list (~10% of
    nnz) moves host→device each epoch, not the full matrix.

    `compute_dtype = int8` falls back to bf16 here: the per-epoch
    dropout graphs have no quantized path (SGL's contrastive views
    are noise-injected by design, but the drop-correction segment-sums
    stay exact).
    """
    compute_dtype, _ = _split_quant(compute_dtype)
    # must agree with build_dropout_shared's selection (copies=2): the
    # shared binary matrix coexists with the model's main adjacency
    backend = _select_backend(data, backend, copies=2)
    if backend == "gather":
        return GatherSquareAdj(graph_lib.edge_dropout_adjacency(data, drop_ratio, np_rng))

    if m_bin is None:
        m_bin = build_dropout_shared(data, backend)
    users = np.repeat(np.arange(data.num_users, dtype=np.int64), np.diff(data.row_ptr))
    items = data.col_idx.astype(np.int64)
    nnz = users.size
    n_keep = int(round((1.0 - drop_ratio) * nnz))
    perm = np_rng.permutation(nnz)
    dropped = perm[n_keep:]
    d_users = users[dropped]
    d_items = items[dropped]

    # per-epoch hot path: bincount beats np.add.at by >10x at scale
    du_bin = np.diff(data.row_ptr).astype(np.float64)
    di_bin = np.bincount(items, minlength=data.num_items).astype(np.float64)
    du = du_bin - np.bincount(d_users, minlength=data.num_users)
    di = di_bin - np.bincount(d_items, minlength=data.num_items)

    def _sorted_pad(rows, cols):
        order = np.argsort(rows, kind="stable")
        r, c = rows[order], cols[order]
        vals = np.ones(r.size, np.float32)
        # no padding needed: dropped count is deterministic per ratio
        return (
            jnp.asarray(r, jnp.int32),
            jnp.asarray(c, jnp.int32),
            jnp.asarray(vals),
        )

    du_rows, du_cols, du_vals = _sorted_pad(d_users, d_items)
    di_rows, di_cols, di_vals = _sorted_pad(d_items, d_users)
    nu, ni = data.num_users, data.num_items
    scale_u = _inv_pow_vec(du, 0.5)
    scale_i = _inv_pow_vec(di, 0.5)
    if backend == "bitpack":
        packed, packed_t = m_bin
        return BitDropSquareAdj(
            packed, packed_t, scale_u, scale_i, scale_u, scale_i,
            du_rows, du_cols, du_vals, di_rows, di_cols, di_vals,
            nu, ni, _bitpack_interpret(),
        )
    return DenseDropSquareAdj(
        m_bin, scale_u, scale_i, scale_u, scale_i,
        du_rows, du_cols, du_vals, di_rows, di_cols, di_vals,
        nu, ni, compute_dtype,
    )
