"""Fast row scatter-add (Pallas TPU) and the batch-gather VJP on it.

XLA's TPU row scatter-add costs ~45 ns/row of fixed per-row overhead —
0.27 ms for a 6144-row training batch into a [N, 64] table (measured,
scripts/probe_scatter_kernel.py). That scatter is the backward of the
batch-embedding gathers in every BPR loss head and the largest
remaining non-propagation step cost (docs/SCALING.md round-5
attribution). The Pallas kernel here keeps the whole destination table
in VMEM, applies the B row updates as a sequential read-modify-write
loop over scalar-prefetched indices (duplicates accumulate in batch
order — the same order np.add.at uses), and writes the table out once:
measured 0.057 ms for the same scatter, ~4.8x faster.

`gather_batch_embeddings` is the user-facing wrapper: forward is the
plain XLA gathers (unchanged, bit-identical); backward runs ONE
Pallas scatter per destination table (user: the user rows; item: pos
and neg concatenated) instead of XLA's per-gather scatters. Scatter
summation order differs from XLA's (unspecified) order by f32
reassociation ulps on duplicate rows — quantization-noise scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the resident destination table (amazon-book item
# table [92160, 64] f32 = 23.6 MB is the largest shipped case).
MAX_TABLE_VMEM_BYTES = 40 * 1024 * 1024


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _scatter_kernel(idx_ref, vals_ref, out_ref, tbl, sem):
    def body(b, carry):
        row = idx_ref[b]
        tbl[pl.ds(row, 1), :] += vals_ref[pl.ds(b, 1), :]
        return carry

    tbl[...] = jnp.zeros_like(tbl)
    jax.lax.fori_loop(0, vals_ref.shape[0], body, 0)
    cp = pltpu.make_async_copy(tbl, out_ref, sem)
    cp.start()
    cp.wait()


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.jit, static_argnums=(2,))
def scatter_add_rows(idx: jnp.ndarray, vals: jnp.ndarray,
                     n_rows: int) -> jnp.ndarray:
    """sum_b onehot(idx[b]) vals[b] -> [n_rows, d] f32 via the
    VMEM-resident Pallas kernel. idx int32 [B], vals [B, d]."""
    b, d = vals.shape
    n_pad = _round8(n_rows)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((b, d), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((n_pad, d), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    out = pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * n_pad * d * 4 + 12 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(idx, vals.astype(jnp.float32))
    return out[:n_rows]


def supports_fast_scatter(n_rows: int, d: int,
                          compute_dtype: str = "int8") -> bool:
    """Table must fit the VMEM residency budget; the sharded path keeps
    XLA's scatter (the loss runs per-shard under a mesh); and only the
    QUANTIZED compute modes take the kernel. Measured in one
    uninterrupted backend × dtype matrix
    (docs/evidence/bench_matrix.json, 2026-08-20): with the kernel
    active everywhere, int4 improved to 312.7k pairs/s and int8 to
    151.8k, but BOTH bf16 legs dropped ~11% (99.6k → 88.8k) — the
    kernel interacts badly with the bf16 mode's all-XLA step program —
    so non-quantized modes keep XLA's scatter. (The propagated tables
    are f32 in every mode, so the gate keys on the model's
    compute_dtype, not the table dtype.) IDGREC_FAST_SCATTER=0
    disables (measurement escape hatch)."""
    import os

    if os.environ.get("IDGREC_FAST_SCATTER", "1") == "0":
        return False
    if not str(compute_dtype).startswith("int"):
        return False
    if _round8(n_rows) * d * 4 > MAX_TABLE_VMEM_BYTES:
        return False
    from idgrec_tpu.parallel import mesh as mesh_lib

    return mesh_lib.get_active_mesh() is None


@functools.lru_cache(maxsize=None)
def _make_gbe(nu: int, ni: int, udtype: str, idtype: str):
    @jax.custom_vjp
    def gbe(user_all, item_all, u, p, n):
        return user_all[u], item_all[p], item_all[n]

    def fwd(user_all, item_all, u, p, n):
        return gbe(user_all, item_all, u, p, n), (u, p, n)

    def bwd(res, g):
        u, p, n = res
        gu, gp, gn = g
        du = scatter_add_rows(u, gu, nu).astype(udtype)
        di = scatter_add_rows(jnp.concatenate([p, n]),
                              jnp.concatenate([gp, gn]),
                              ni).astype(idtype)
        return du, di, None, None, None

    gbe.defvjp(fwd, bwd)
    return gbe


def gather_batch_embeddings(user_all, item_all, u, p, n):
    """(user_all[u], item_all[p], item_all[n]) with the backward's row
    scatters on the Pallas kernel (one per destination table)."""
    return _make_gbe(user_all.shape[0], item_all.shape[0],
                     str(user_all.dtype), str(item_all.dtype))(
        user_all, item_all, u, p, n)


@functools.lru_cache(maxsize=None)
def _make_gup(nu: int, ni: int, udtype: str, idtype: str):
    @jax.custom_vjp
    def gup(user_all, item_all, u, p):
        return user_all[u], item_all[p]

    def fwd(user_all, item_all, u, p):
        return gup(user_all, item_all, u, p), (u, p)

    def bwd(res, g):
        u, p = res
        gu, gp = g
        du = scatter_add_rows(u, gu, nu).astype(udtype)
        di = scatter_add_rows(p, gp, ni).astype(idtype)
        return du, di, None, None

    gup.defvjp(fwd, bwd)
    return gup


def gather_user_pos(user_all, item_all, u, p):
    """(user_all[u], item_all[p]) — the 2-gather variant (DirectAU /
    MAWU / LightGODE pattern) with Pallas scatter backwards."""
    return _make_gup(user_all.shape[0], item_all.shape[0],
                     str(user_all.dtype), str(item_all.dtype))(
        user_all, item_all, u, p)
