"""Whole-chain VMEM-resident propagation (Pallas TPU mega-kernel).

The quantized transposed chain (ops/propagate.fused_chain_t) launches
one dual T-sweep kernel per layer and does the inter-sweep elementwise
work (right-scale, int8 quantize, dequant, left-scale, layer-combine
accumulation) in XLA between launches. Every one of those passes
round-trips the [d, N_pad] activations through HBM — measured ~0.08 ms
per sweep of in-chain overhead plus the layer-combine traffic
(docs/evidence/step_cost_table.json: 1.02 ms in-chain vs 0.94 ms
standalone per sweep).

This module runs the WHOLE K-layer chain as ONE Pallas kernel with a
(layer, row-block, col-block) grid. Activations, dequant scales, and
the layer-combine accumulator stay resident in VMEM across all K
sweeps, and the inter-sweep elementwise work is DISTRIBUTED across
grid steps so it pipelines against DMAs and MXU dots instead of
serializing between sweeps: each output block's dequant + norm scale
+ combine + pre-scale + amax runs at that block's completion step,
and the next sweep's int8 round() runs lazily at each block's first
consumption; only a [d, 1] scale computation remains at the sweep
boundary. Per sweep, HBM traffic collapses to the packed adjacency
read alone — the floor SCALING.md derives.

The backward chain is the SAME kernel by symmetry. Forward layer:
    h_{k+1} = l ⊙ dequant(M̂_dual(quant(r ⊙ h_k))),  c += h_{k+1}
Backward (straight-through quantized duals, as in
propagate.quant_fused_dual_t's custom VJP):
    G_k = g + r ⊙ dequant(M̂_dual(quant(l ⊙ G_{k+1}))),  G_K = g
i.e. the same sweep with (pre, post) = (l, r) instead of (r, l) and
the combine cotangent g INJECTED each sweep instead of accumulated
out. One kernel body, two vector bindings, one mode flag.

Numerics: the integer MAC structure is identical to fused_chain_t's
kernels (same tile shapes, operand slices, int32 accumulation and f32
conversion points as ops/fusedmm's _tkernel_int{8,4}), and the f32
epilogue applies the same ops in the same order as _quantize_rows /
_qfdt_impl / fused_chain_t. Results are NOT bit-pinned to the
per-sweep path, only ulp-close: compilers contract mul→add chains
into FMAs at codegen (measured on XLA:CPU — the jitted trainer
already differs from the eager test path the same way), which can
shift the epilogue by ulps and, on a round-to-nearest tie, a
quantized activation by 1 lsb. This is far below the int8
quantization's own quality-pinned approximation
(docs/evidence/quant_parity*.json); tests/test_chainmm.py pins
value- and gradient-level agreement at 1e-5-scale tolerances.
Capability parity anchor: reference models/LightGCN.py:36-52
(propagation + mean combine), whose chain this accelerates.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from idgrec_tpu.ops import fusedmm

# VMEM budget for the resident state (accumulators + combine + int8
# activations + vectors + double-buffered matrix tiles). The v5e
# accepts well past the nominal 16 MB guide figure — the wide int8
# T-kernel already runs with ~55 MB of compiler-visible VMEM
# (fusedmm.MAX_YI_VMEM_BYTES_WIDE rationale); measured headroom for
# this kernel's ~52 MB at yelp2018 scale is validated on-chip
# (scripts/microbench_chain_resident.py).
MAX_CHAIN_VMEM_BYTES = 62 * 1024 * 1024

_ROW_TILE_DEFAULT = 8192  # measured on v5e: 8192-row tiles edge out 4096 in
# the resident chain (6.32 vs 6.42 ms fwd+bwd; fewer, larger chunk
# steps) while the tile pair still fits the VMEM budget


def _chain_vmem_bytes(u_pad: int, i_pad: int, d: int, quant: str, tu: int) -> int:
    m_cols = (fusedmm.PACK_TILE // 2) if quant == "int4" else fusedmm.TI
    n = u_pad + i_pad
    return (
        2 * tu * m_cols          # double-buffered matrix tiles (int8)
        + n * d                  # qu_s + qi_s (int8)
        + 2 * n * d * 4          # yu_s/yi_s + cu_s/ci_s (f32)
        + 4 * 8 * n              # pre/post vectors ([1, N] padded to 8 sublanes)
        + 4 * 1024 * 1024        # blocks, scales, slack
    )


def supports_chain_resident(adj, d: int, num_layers: int,
                            reduce: str | None, activation,
                            include_layer0: bool = True,
                            seed: bool = False) -> bool:
    """Whether the resident mega-kernel can run this chain: quantized
    fused backend, no self-loop diag, activation None or jnp.tanh
    (tanh chains require include_layer0=False — the EGCF family), a
    reduce mode (per-layer lists keep fused_chain_t), tile-divisible
    padding, VMEM budget, and no model-parallel mesh (the sharded path
    has its own collective structure)."""
    from idgrec_tpu.ops.propagate import FusedSquareAdj

    if not isinstance(adj, FusedSquareAdj) or adj.quant not in ("int8", "int4"):
        return False
    if num_layers < 1 or reduce not in ("mean", "sum"):
        return False
    if activation is not None and activation is not jnp.tanh:
        return False
    if (activation is not None or seed) and include_layer0:
        return False
    if seed and activation is None:
        return False
    if adj.has_diag:
        return False
    u_pad, i_pad = adj.padded_shape
    ti = fusedmm.PACK_TILE if adj.quant == "int4" else fusedmm.TI
    tu = fusedmm.pick_row_tile(u_pad, default=_ROW_TILE_DEFAULT)
    if tu is None or i_pad % ti != 0:
        return False
    if _chain_vmem_bytes(u_pad, i_pad, d, adj.quant, tu) > MAX_CHAIN_VMEM_BYTES:
        return False
    from idgrec_tpu.parallel import mesh as mesh_lib

    mesh = mesh_lib.get_active_mesh()
    return mesh is None or mesh.shape.get("model", 1) == 1


def _quantize_rows(zT: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """propagate._quantize_rows, re-stated here to avoid an import
    cycle — identical ops, identical order (bit-parity requirement)."""
    amax = jnp.max(jnp.abs(zT), axis=1, keepdims=True)
    scale = jnp.where(amax > 0.0, amax / 127.0, 1.0).astype(jnp.float32)
    q = jnp.round(zT / scale).astype(jnp.int8)
    return q, scale


def _make_chain_kernel(num_layers: int, tu: int, ti: int, quant: str,
                       mode: str, include_layer0: bool,
                       debug_level: int = 0, activation: str | None = None,
                       seed: bool = False):
    """Kernel body closure. Grid (k, i, j): k = sweep, i = row block,
    j = logical column block (PACK_TILE for int4, TI for int8).

    mode 'fwd': epilogue computes h = act(post⊙(y⊙s)), combine c += h,
    and quantizes pre⊙h for the next sweep. Output = the combine c.
    mode 'bwd': epilogue computes G = g + post⊙(y⊙s) (g VMEM-resident)
    and quantizes pre⊙((1-h²)⊙G) for the next sweep (tanh chains).
    Output = G after the final sweep.

    activation 'tanh' (EGCF, reference models/EGCF.py:73-84): forward
    applies tanh in each completion chunk and streams the per-layer
    tanh outputs to HBM (hs outputs) for the backward's derivative.
    seed (EGCF parallel mode, models/EGCF.py:67-72): forward sweep 0
    seeds hu = tanh(lu⊙M(ri⊙E_i)) while the item side stays E_i (its
    quantization carries unchanged into counted layer 1); backward
    appends one extra sweep mapping G_0's user side back to the item
    embeddings through the seed application (the user input is the
    zero vector, so d(x0_user) = 0 exactly).

    debug_level (scripts/probe_chain_parts.py cost attribution ONLY —
    numerically wrong): 1 = skip completion chunks + scales,
    2 = additionally skip the lazy rounds (pure dot core).
    """
    half = ti // 2
    S = 1 if seed else 0
    n_sweeps = num_layers + S
    last_k = n_sweeps - 1
    # bwd inject bound (include_layer0=False): G_k injects g for
    # layers k >= 1 only — sweeps t < num_layers - 1
    inject_lim = num_layers - 1
    if seed:
        assert not include_layer0, "seed semantics exclude layer 0"
        assert mode in ("fwd", "bwd")
        assert activation == "tanh", "seed is defined with tanh"

    def kernel(*refs):
        (m_ref,                    # VMEM block [tu, m_cols]
         q0u_ref, q0i_ref,         # ANY int8 [d, U_pad]/[d, I_pad]
         s0u_ref, s0i_ref,         # VMEM f32 [d, 1] (constant block)
         pre_u_ref, pre_i_ref,     # ANY f32 [1, U_pad]/[1, I_pad]
         post_u_ref, post_i_ref,   # ANY f32
         cinit_u_ref, cinit_i_ref) = refs[:11]
        refs = refs[11:]
        if activation and mode == "bwd":
            hsu_in, hsi_in = refs[:2]  # ANY f32 [n_fwd, d, N]
            refs = refs[2:]
        outu_ref, outi_ref = refs[:2]  # ANY f32 [d, U_pad]/[d, I_pad]
        refs = refs[2:]
        if activation and mode == "fwd":
            hsu_out, hsi_out = refs[:2]  # ANY f32 [n_sweeps, d, N]
            refs = refs[2:]
        (qu_s, qi_s,               # VMEM int8 activations (current sweep)
         su_s, si_s,               # VMEM f32 [d, 1] current dequant scales
         amaxu_s, amaxi_s,         # VMEM f32 [d, 1] next-scale amax accum
         yu_s, yi_s,               # VMEM f32 dual accumulators
         cu_s, ci_s,               # VMEM f32 combine (fwd) / resident g (bwd)
         vpre_u, vpre_i,           # VMEM f32 [1, N] vectors
         vpost_u, vpost_i,
         sem) = refs[:15]          # DMA semaphore (reused sequentially)
        refs = refs[15:]
        if activation:
            stage_u, stage_i, sem2 = refs  # [d, tu]/[d, ti] f32 staging

        k = pl.program_id(0)
        i = pl.program_id(1)
        j = pl.program_id(2)
        ni = pl.num_programs(1)
        nj = pl.num_programs(2)

        @pl.when((k == 0) & (i == 0) & (j == 0))
        def _init():
            # one-time residency copies; sequential waits (~30 µs once
            # per chain, amortized over K sweeps)
            for src, dst in (
                (q0u_ref, qu_s), (q0i_ref, qi_s),
                (pre_u_ref, vpre_u), (pre_i_ref, vpre_i),
                (post_u_ref, vpost_u), (post_i_ref, vpost_i),
            ):
                cp = pltpu.make_async_copy(src, dst, sem)
                cp.start()
                cp.wait()
            if include_layer0 or mode == "bwd":
                for src, dst in ((cinit_u_ref, cu_s), (cinit_i_ref, ci_s)):
                    cp = pltpu.make_async_copy(src, dst, sem)
                    cp.start()
                    cp.wait()
            su_s[...] = s0u_ref[...]
            si_s[...] = s0i_ref[...]

        d = qu_s.shape[0]

        # ---- lazy per-block quantize of the PREVIOUS sweep's output,
        # at each block's first consumption (j==0 for user blocks,
        # i==0 for item blocks). The z values were stored into yu_s /
        # yi_s by that sweep's completion chunks; the scales were
        # finalized at its last grid step. Distributing the round()
        # across grid steps (instead of one serial inter-sweep block)
        # lets it pipeline against other blocks' DMAs and MXU dots.
        @pl.when(j == 0)
        def _consume_u():
            if debug_level < 2:
                @pl.when(k > 0)
                def _():
                    qu_s[:, pl.ds(i * tu, tu)] = jnp.round(
                        yu_s[:, pl.ds(i * tu, tu)] / su_s[...]).astype(jnp.int8)

            yu_s[:, pl.ds(i * tu, tu)] = jnp.zeros((d, tu), jnp.float32)

        @pl.when(i == 0)
        def _consume_i():
            if debug_level < 2:
                # FORWARD seed only: the first counted layer reuses the
                # seed's item quantization unchanged (its input IS
                # ri⊙E_i again) — no round until k > 1 there. The
                # backward rounds every sweep.
                round_after = S if mode == "fwd" else 0

                @pl.when(k > round_after)
                def _():
                    qi_s[:, pl.ds(j * ti, ti)] = jnp.round(
                        yi_s[:, pl.ds(j * ti, ti)] / si_s[...]).astype(jnp.int8)

            yi_s[:, pl.ds(j * ti, ti)] = jnp.zeros((d, ti), jnp.float32)

        qu_blk = qu_s[:, pl.ds(i * tu, tu)]
        if quant == "int4":
            # exact replication of fusedmm._tkernel_int4's dot and
            # conversion structure (mask-only unpack, >>4 on outputs)
            raw = m_ref[...]
            lo = raw & 0xF
            hi16 = raw & jnp.int8(-16)
            q1 = qi_s[:, pl.ds(j * ti, half)]
            q2 = qi_s[:, pl.ds(j * ti + half, half)]
            yu_s[:, pl.ds(i * tu, tu)] += (
                jax.lax.dot_general(
                    q1, lo, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                + (jax.lax.dot_general(
                    q2, hi16, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32) >> 4)
            ).astype(jnp.float32)
            yi_s[:, pl.ds(j * ti, half)] += jax.lax.dot_general(
                qu_blk, lo, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            yi_s[:, pl.ds(j * ti + half, half)] += (
                jax.lax.dot_general(
                    qu_blk, hi16, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32) >> 4
            ).astype(jnp.float32)
        else:  # int8 — fusedmm._tkernel_int8's structure
            mm = m_ref[...]
            yu_s[:, pl.ds(i * tu, tu)] += jax.lax.dot_general(
                qi_s[:, pl.ds(j * ti, ti)], mm,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            yi_s[:, pl.ds(j * ti, ti)] += jax.lax.dot_general(
                qu_blk, mm,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)

        # ---- per-block completion chunks. A user block i finishes its
        # reduction at (k, i, nj-1); an item block j at (k, ni-1, j).
        # Each chunk dequants (yu by the ITEM input's scale: yu = M@zi
        # — same op order as _qfdt_impl then fused_chain_t:
        # post ⊙ (raw ⊙ s)), folds the combine (fwd) / cotangent
        # inject (bwd), stores the next sweep's pre-scaled z in place,
        # and max-accumulates the per-feature amax. Only the [d, 1]
        # scale computation remains at the sweep's final grid step —
        # the O(N·d) inter-sweep work all pipelines with other blocks'
        # DMAs and dots.
        def _amax_update(amax_s, z, first):
            local = jnp.max(jnp.abs(z), axis=1, keepdims=True)

            @pl.when(first)
            def _():
                amax_s[...] = local

            @pl.when(jnp.logical_not(first))
            def _():
                amax_s[...] = jnp.maximum(amax_s[...], local)

        def _chunk(blk, y_s, c_s, vpost, vpre, s_in, amax_s, first):
            """Plain (activation=None) chunk — unchanged from the
            LightGCN-path version; bit-compatible with it."""
            nh = vpost[:, blk] * (y_s[:, blk] * s_in[...])
            if mode == "fwd":
                if include_layer0:
                    c_s[:, blk] += nh
                else:
                    @pl.when(k == 0)
                    def _():
                        # first counted layer SEEDS the combine
                        # (matches fused_chain_t's layers[0] when
                        # layer 0 is excluded — no 0 + x add)
                        c_s[:, blk] = nh

                    @pl.when(k > 0)
                    def _():
                        c_s[:, blk] += nh
                store = nh
            else:
                # bwd: inject the combine cotangent g. Every counted
                # layer k >= 1 contributes directly to the combine, so
                # every sweep producing G_{k>=1} injects; the final
                # sweep (producing G_0) injects only when layer 0 is
                # itself a combine term.
                if include_layer0:
                    store = c_s[:, blk] + nh
                elif num_layers > 1:
                    store = jnp.where(k < last_k, c_s[:, blk] + nh, nh)
                else:
                    store = nh
            y_s[:, blk] = store

            @pl.when(k < last_k)
            def _prescale():
                z = vpre[:, blk] * y_s[:, blk]
                y_s[:, blk] = z
                _amax_update(amax_s, z, first)

        def _fetch_h(hs_ref, hidx, blk, stage, semx):
            cp = pltpu.make_async_copy(hs_ref.at[hidx, :, blk], stage, semx)
            cp.start()
            cp.wait()

        def _chunk_fwd_act(blk, y_s, c_s, vpost, vpre, s_in, amax_s, first,
                           hs_out, stage, semx):
            """tanh chunk (fwd): h streams to HBM for the backward."""
            stage[...] = jnp.tanh(vpost[:, blk] * (y_s[:, blk] * s_in[...]))
            cp = pltpu.make_async_copy(stage, hs_out.at[k, :, blk], semx)
            cp.start()
            cp.wait()
            # combine (sum over counted layers; include_layer0=False is
            # asserted for activation chains): the first counted sweep
            # (k == S) seeds the accumulator; with seed, k == 0 is the
            # seed sweep — not a combine term — and neither branch fires
            @pl.when(k == S)
            def _():
                c_s[:, blk] = stage[...]

            @pl.when(k > S)
            def _():
                c_s[:, blk] += stage[...]

            @pl.when(k < last_k)
            def _prescale():
                z = vpre[:, blk] * stage[...]
                y_s[:, blk] = z
                _amax_update(amax_s, z, first)

        def _chunk_bwd_act(blk, y_s, c_s, vpost, vpre, s_in, amax_s, first,
                           hs_in, stage, semx, side_u):
            """tanh chunk (bwd): out = post⊙(y⊙s); G = [g +] out; next
            input z = pre⊙((1-h²)⊙G) with h fetched from the forward's
            stream. With seed, sweep t = num_layers-1 produces G_0
            (stored into the freed g-buffer for the final seed-bwd
            sweep) and only the user side prepares a next input; the
            final sweep emits dE_i = G_0_i + pre_i⊙(y_i⊙s)."""
            out = vpost[:, blk] * (y_s[:, blk] * s_in[...])
            if seed:
                @pl.when(k < inject_lim)
                def _():
                    y_s[:, blk] = c_s[:, blk] + out

                @pl.when(k == inject_lim)
                def _():
                    # G_0: no inject; park it in the g-buffer (g is
                    # dead from here on) for the seed-bwd sweep
                    y_s[:, blk] = out
                    c_s[:, blk] = out

                if side_u:
                    @pl.when(k == inject_lim)
                    def _():
                        # prep the seed-bwd input from hu_seed (slice 0)
                        _fetch_h(hs_in, 0, blk, stage, semx)
                        z = vpre[:, blk] * (
                            (1.0 - stage[...] * stage[...]) * y_s[:, blk])
                        y_s[:, blk] = z
                        _amax_update(amax_s, z, first)
                else:
                    @pl.when(k == last_k)
                    def _():
                        # dE_i = G_0_i + ri⊙(Mᵀq(z_u)⊙s); `out` above
                        # is exactly the seed-chain term (vpost = r in
                        # the backward binding)
                        y_s[:, blk] = c_s[:, blk] + out
                # counted sweeps before G_0: standard tanh prescale
                @pl.when(k < inject_lim)
                def _():
                    hidx = (num_layers - 1) - k
                    _fetch_h(hs_in, hidx, blk, stage, semx)
                    z = vpre[:, blk] * (
                        (1.0 - stage[...] * stage[...]) * y_s[:, blk])
                    y_s[:, blk] = z
                    _amax_update(amax_s, z, first)
            else:
                if include_layer0:
                    y_s[:, blk] = c_s[:, blk] + out
                elif num_layers > 1:
                    y_s[:, blk] = jnp.where(k < last_k, c_s[:, blk] + out, out)
                else:
                    y_s[:, blk] = out

                @pl.when(k < last_k)
                def _():
                    hidx = (num_layers - 2) - k
                    _fetch_h(hs_in, hidx, blk, stage, semx)
                    z = vpre[:, blk] * (
                        (1.0 - stage[...] * stage[...]) * y_s[:, blk])
                    y_s[:, blk] = z
                    _amax_update(amax_s, z, first)

        if debug_level == 0:
            if activation is None:
                @pl.when(j == nj - 1)
                def _chunk_u():
                    _chunk(pl.ds(i * tu, tu), yu_s, cu_s, vpost_u, vpre_u,
                           si_s, amaxu_s, i == 0)

                @pl.when(i == ni - 1)
                def _chunk_i():
                    _chunk(pl.ds(j * ti, ti), yi_s, ci_s, vpost_i, vpre_i,
                           su_s, amaxi_s, j == 0)
            elif mode == "fwd":
                @pl.when(j == nj - 1)
                def _chunk_u_act():
                    _chunk_fwd_act(pl.ds(i * tu, tu), yu_s, cu_s, vpost_u,
                                   vpre_u, si_s, amaxu_s, i == 0,
                                   hsu_out, stage_u, sem2)

                def _ci():
                    _chunk_fwd_act(pl.ds(j * ti, ti), yi_s, ci_s, vpost_i,
                                   vpre_i, su_s, amaxi_s, j == 0,
                                   hsi_out, stage_i, sem2)

                if seed:
                    # the seed sweep's item direction is discarded
                    # (the item side stays E_i — models/EGCF.py:67-72)
                    @pl.when((i == ni - 1) & (k >= S))
                    def _chunk_i_act():
                        _ci()
                else:
                    @pl.when(i == ni - 1)
                    def _chunk_i_act():
                        _ci()
            else:  # bwd with activation
                @pl.when(j == nj - 1)
                def _chunk_u_bact():
                    if seed:
                        # the final seed-bwd sweep's user direction is
                        # identically zero (the seed consumed a zero
                        # user input): zero it for the emit
                        @pl.when(k == last_k)
                        def _():
                            yu_s[:, pl.ds(i * tu, tu)] = jnp.zeros(
                                (d, tu), jnp.float32)

                        @pl.when(k < last_k)
                        def _():
                            _chunk_bwd_act(pl.ds(i * tu, tu), yu_s, cu_s,
                                           vpost_u, vpre_u, si_s, amaxu_s,
                                           i == 0, hsu_in, stage_u, sem2,
                                           True)
                    else:
                        _chunk_bwd_act(pl.ds(i * tu, tu), yu_s, cu_s,
                                       vpost_u, vpre_u, si_s, amaxu_s,
                                       i == 0, hsu_in, stage_u, sem2, True)

                @pl.when(i == ni - 1)
                def _chunk_i_bact():
                    _chunk_bwd_act(pl.ds(j * ti, ti), yi_s, ci_s, vpost_i,
                                   vpre_i, su_s, amaxi_s, j == 0,
                                   hsi_in, stage_i, sem2, False)

        @pl.when((i == ni - 1) & (j == nj - 1))
        def _sweep_end():
            if debug_level == 0:
                @pl.when(k < last_k)
                def _scales():
                    su_s[...] = jnp.where(
                        amaxu_s[...] > 0.0, amaxu_s[...] / 127.0, 1.0
                    ).astype(jnp.float32)
                    if seed and mode == "fwd":
                        # the seed sweep leaves the item quantization
                        # untouched (reused by counted layer 1)
                        @pl.when(k >= S)
                        def _():
                            si_s[...] = jnp.where(
                                amaxi_s[...] > 0.0, amaxi_s[...] / 127.0, 1.0
                            ).astype(jnp.float32)
                    else:
                        si_s[...] = jnp.where(
                            amaxi_s[...] > 0.0, amaxi_s[...] / 127.0, 1.0
                        ).astype(jnp.float32)

            @pl.when(k == last_k)
            def _emit():
                src_u, src_i = (cu_s, ci_s) if mode == "fwd" else (yu_s, yi_s)
                for src, dst in ((src_u, outu_ref), (src_i, outi_ref)):
                    cp = pltpu.make_async_copy(src, dst, sem)
                    cp.start()
                    cp.wait()

    return kernel


def _chain_call(m, u_pad, i_pad, num_layers, quant, mode, include_layer0,
                q0u, q0i, s0u, s0i, pre_u, pre_i, post_u, post_i,
                cinit_u, cinit_i, interpret, debug_level: int = 0,
                activation: str | None = None, seed: bool = False,
                hs=None):
    d = q0u.shape[0]
    ti = fusedmm.PACK_TILE if quant == "int4" else fusedmm.TI
    m_cols = ti // 2 if quant == "int4" else ti
    tu = fusedmm.pick_row_tile(u_pad, default=_ROW_TILE_DEFAULT)
    assert tu is not None and i_pad % ti == 0
    kernel = _make_chain_kernel(num_layers, tu, ti, quant, mode,
                                include_layer0, debug_level,
                                activation=activation, seed=seed)
    n_sweeps = num_layers + (1 if seed else 0)
    grid = (n_sweeps, u_pad // tu, i_pad // ti)
    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    in_specs = [
        pl.BlockSpec((tu, m_cols), lambda k, i, j: (i, j),
                     memory_space=pltpu.VMEM),
        any_spec, any_spec,  # q0u, q0i
        pl.BlockSpec((d, 1), lambda k, i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((d, 1), lambda k, i, j: (0, 0), memory_space=pltpu.VMEM),
        any_spec, any_spec, any_spec, any_spec,  # pre/post vectors
        any_spec, any_spec,  # cinit
    ]
    args = [m, q0u, q0i, s0u, s0i, pre_u, pre_i, post_u, post_i,
            cinit_u, cinit_i]
    if activation and mode == "bwd":
        in_specs += [any_spec, any_spec]  # forward h streams
        args += [hs[0], hs[1]]
    out_specs = [any_spec, any_spec]
    out_shape = [
        jax.ShapeDtypeStruct((d, u_pad), jnp.float32),
        jax.ShapeDtypeStruct((d, i_pad), jnp.float32),
    ]
    if activation and mode == "fwd":
        out_specs += [any_spec, any_spec]  # per-layer h streams
        out_shape += [
            jax.ShapeDtypeStruct((n_sweeps, d, u_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_sweeps, d, i_pad), jnp.float32),
        ]
    scratch = [
        pltpu.VMEM((d, u_pad), jnp.int8),   # qu_s
        pltpu.VMEM((d, i_pad), jnp.int8),   # qi_s
        pltpu.VMEM((d, 1), jnp.float32),    # su_s
        pltpu.VMEM((d, 1), jnp.float32),    # si_s
        pltpu.VMEM((d, 1), jnp.float32),    # amaxu_s
        pltpu.VMEM((d, 1), jnp.float32),    # amaxi_s
        pltpu.VMEM((d, u_pad), jnp.float32),  # yu_s
        pltpu.VMEM((d, i_pad), jnp.float32),  # yi_s
        pltpu.VMEM((d, u_pad), jnp.float32),  # cu_s
        pltpu.VMEM((d, i_pad), jnp.float32),  # ci_s
        pltpu.VMEM((1, u_pad), jnp.float32),  # vpre_u
        pltpu.VMEM((1, i_pad), jnp.float32),  # vpre_i
        pltpu.VMEM((1, u_pad), jnp.float32),  # vpost_u
        pltpu.VMEM((1, i_pad), jnp.float32),  # vpost_i
        pltpu.SemaphoreType.DMA,
    ]
    if activation:
        scratch += [
            pltpu.VMEM((d, tu), jnp.float32),  # stage_u
            pltpu.VMEM((d, ti), jnp.float32),  # stage_i
            pltpu.SemaphoreType.DMA,           # sem2 (stage transfers)
        ]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_chain_vmem_bytes(u_pad, i_pad, d, quant, tu)
            + 16 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * u_pad * i_pad * d * n_sweeps,
            bytes_accessed=u_pad * m.shape[1] * n_sweeps
            + (u_pad + i_pad) * d * 9,
            transcendentals=(u_pad + i_pad) * d * n_sweeps if activation else 0,
        ),
        interpret=interpret,
    )(*args)
    return out


def _prep_vectors(adj, u_pad: int, i_pad: int):
    nu, ni = adj.num_users, adj.num_items
    pad = lambda v, n: jnp.pad(v, (0, n - v.shape[0]))[None, :]
    ru = pad(adj.right_u, u_pad)
    ri = pad(adj.right_i, i_pad)
    lu = pad(adj.left_u, u_pad)
    li = pad(adj.left_i, i_pad)
    return ru, ri, lu, li


def _run_chain(adj, xT_u, xT_i, num_layers, include_layer0, mode,
               activation=None, seed=False, hs=None, h_last=None):
    """Shared fwd/bwd driver: prologue quantize of pre⊙x in XLA (one
    pass), then the mega-kernel. xT_u [d, U_pad], xT_i [d, I_pad] is h0
    (fwd) / the scaled combine cotangent g (bwd).

    Activation chains: the bwd prologue quantizes pre⊙((1-h_K²)⊙g)
    (h_last = the final layer's saved tanh outputs); the fwd seed
    prologue quantizes a ZERO user side exactly as _quantize_rows
    would (q=0, scale=1 — the seed consumes x0_user = 0)."""
    u_pad, i_pad = adj.padded_shape
    ru, ri, lu, li = _prep_vectors(adj, u_pad, i_pad)
    pre_u, pre_i, post_u, post_i = (
        (ru, ri, lu, li) if mode == "fwd" else (lu, li, ru, ri)
    )
    d = xT_u.shape[0]
    zu, zi = xT_u, xT_i
    if activation and mode == "bwd":
        hu, hi = h_last
        zu = (1.0 - hu * hu) * zu
        zi = (1.0 - hi * hi) * zi
    if seed and mode == "fwd":
        q0u = jnp.zeros((d, u_pad), jnp.int8)
        s0u = jnp.ones((d, 1), jnp.float32)
    else:
        q0u, s0u = _quantize_rows(pre_u * zu)
    q0i, s0i = _quantize_rows(pre_i * zi)
    return _chain_call(
        adj.m8, u_pad, i_pad, num_layers, adj.quant, mode, include_layer0,
        q0u, q0i, s0u, s0i, pre_u, pre_i, post_u, post_i,
        xT_u, xT_i, adj.interpret, activation=activation, seed=seed, hs=hs,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _chain_resident_T(adj, embT, num_layers, include_layer0, reduce):
    """Combined chain output in [d, nu+ni] layout (unpadded)."""
    return _chain_fwd(adj, embT, num_layers, include_layer0, reduce)[0]


def _chain_fwd(adj, embT, num_layers, include_layer0, reduce):
    nu, ni = adj.num_users, adj.num_items
    u_pad, i_pad = adj.padded_shape
    xu = jnp.pad(embT[:, :nu], ((0, 0), (0, u_pad - nu)))
    xi = jnp.pad(embT[:, nu:], ((0, 0), (0, i_pad - ni)))
    cu, ci = _run_chain(adj, xu, xi, num_layers, include_layer0, "fwd")
    n_terms = num_layers + (1 if include_layer0 else 0)
    if reduce == "mean":
        # divide, not multiply-by-reciprocal: bit-matches jnp.mean
        # (fused_chain_t's rationale)
        cu, ci = cu / jnp.float32(n_terms), ci / jnp.float32(n_terms)
    out = jnp.concatenate([cu[:, :nu], ci[:, :ni]], axis=1)
    return out, (adj,)


def _chain_bwd(num_layers, include_layer0, reduce, res, gT):
    (adj,) = res
    nu, ni = adj.num_users, adj.num_items
    u_pad, i_pad = adj.padded_shape
    n_terms = num_layers + (1 if include_layer0 else 0)
    if reduce == "mean":
        gT = gT / jnp.float32(n_terms)
    gu = jnp.pad(gT[:, :nu], ((0, 0), (0, u_pad - nu)))
    gi = jnp.pad(gT[:, nu:], ((0, 0), (0, i_pad - ni)))
    # The kernel's inject recursion G_k = g + r⊙Λ*(l⊙G_{k+1}) already
    # carries the direct combine term of every layer, INCLUDING layer 0
    # when include_layer0 (the final sweep's inject) — no extra add.
    Gu, Gi = _run_chain(adj, gu, gi, num_layers, include_layer0, "bwd")
    dembT = jnp.concatenate([Gu[:, :nu], Gi[:, :ni]], axis=1)
    return (None, dembT)


_chain_resident_T.defvjp(_chain_fwd, _chain_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _chain_resident_act_T(adj, embT, num_layers, reduce, seed):
    """tanh-activation chain (optional EGCF seed), [d, nu+ni] layout.
    include_layer0 is False by construction (asserted in the kernel)."""
    return _chain_act_fwd(adj, embT, num_layers, reduce, seed)[0]


def _chain_act_fwd(adj, embT, num_layers, reduce, seed):
    nu, ni = adj.num_users, adj.num_items
    u_pad, i_pad = adj.padded_shape
    xu = jnp.pad(embT[:, :nu], ((0, 0), (0, u_pad - nu)))
    xi = jnp.pad(embT[:, nu:], ((0, 0), (0, i_pad - ni)))
    cu, ci, hs_u, hs_i = _run_chain(adj, xu, xi, num_layers, False, "fwd",
                                    activation="tanh", seed=seed)
    if reduce == "mean":
        n = jnp.float32(num_layers)
        cu, ci = cu / n, ci / n
    out = jnp.concatenate([cu[:, :nu], ci[:, :ni]], axis=1)
    return out, (adj, hs_u, hs_i)


def _chain_act_bwd(num_layers, reduce, seed, res, gT):
    adj, hs_u, hs_i = res
    nu, ni = adj.num_users, adj.num_items
    u_pad, i_pad = adj.padded_shape
    if reduce == "mean":
        gT = gT / jnp.float32(num_layers)
    gu = jnp.pad(gT[:, :nu], ((0, 0), (0, u_pad - nu)))
    gi = jnp.pad(gT[:, nu:], ((0, 0), (0, i_pad - ni)))
    last = num_layers - 1 + (1 if seed else 0)  # fwd slice of layer K
    Gu, Gi = _run_chain(adj, gu, gi, num_layers, False, "bwd",
                        activation="tanh", seed=seed,
                        hs=(hs_u, hs_i), h_last=(hs_u[last], hs_i[last]))
    dembT = jnp.concatenate([Gu[:, :nu], Gi[:, :ni]], axis=1)
    return (None, dembT)


_chain_resident_act_T.defvjp(_chain_act_fwd, _chain_act_bwd)


def fused_chain_resident(adj, emb0: jnp.ndarray, num_layers: int,
                         include_layer0: bool = True,
                         reduce: str = "mean", activation=None,
                         seed_users_from_items: bool = False) -> jnp.ndarray:
    """Drop-in twin of propagate.fused_chain_t for reduce modes —
    whole chain in one kernel launch, VMEM-resident state, HBM traffic
    = K adjacency reads (+ the per-layer tanh stream for activation
    chains). Outputs and gradients agree with the per-sweep chain to
    compiler-FMA ulps / quantization noise (module docstring;
    tests/test_chainmm.py). activation: None or jnp.tanh (EGCF);
    seed_users_from_items: EGCF parallel-mode seeding
    (models/EGCF.py:67-72) — requires include_layer0=False."""
    embT = emb0.astype(jnp.float32).T
    if activation is not None or seed_users_from_items:
        assert not include_layer0, "activation chains exclude layer 0"
        outT = _chain_resident_act_T(adj, embT, num_layers, reduce,
                                     seed_users_from_items)
    else:
        outT = _chain_resident_T(adj, embT, num_layers, include_layer0,
                                 reduce)
    return outT.T.astype(emb0.dtype)
