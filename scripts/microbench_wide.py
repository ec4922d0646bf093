"""Probe: fused T-kernels at multi-chain feature widths (d = 3*64 etc.)
at yelp2018 scale on the real chip.

SGL/SimGCL-style models propagate 3 chains per step over the SAME
binary interaction matrix; feature-batching them into one [3d, N]
T-kernel sweep divides adjacency HBM traffic by 3. The yi VMEM
accumulator scales with i_pad*d*4 (29.9 MB at d=192), above the
conservative MAX_YI_VMEM_BYTES=11MB budget tuned for d=64 — this
script raises the budget and measures whether v5e takes it and at what
throughput, to size the production budgets for the quantized
shared-chain path.

Usage: python scripts/microbench_wide.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from idgrec_tpu.ops import fusedmm

U, I = 31_668, 38_048
NNZ = 1_237_259
STEPS = 50

rng = np.random.default_rng(0)
m = np.zeros((U, I), np.int8)
m[rng.integers(0, U, NNZ), rng.integers(0, I, NNZ)] = 1


def scan_time(fn, args, steps=STEPS):
    """Scan-chained timing with scalar host fetch for tunnel-safe sync."""
    @jax.jit
    def run(*a):
        def body(c, _):
            yu, yi = fn(*c[:1], c[1], c[2])
            # feed outputs back as int8 so the chain is data-dependent
            return (c[0], (yu % 127).astype(jnp.int8), (yi % 127).astype(jnp.int8)), ()
        c, _ = jax.lax.scan(body, a, None, length=steps)
        return c[1].ravel()[0] + c[2].ravel()[0]
    v = float(run(*args))  # compile + warm
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        v = float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return (best - 0.031) / steps


def main():
    for quant in ("int8", "int4"):
        if quant == "int4":
            m_pad = fusedmm.pad_matrix(m, fusedmm.PACK_TILE)
            mat = jnp.asarray(fusedmm.pack_nibbles(m_pad))
            call = fusedmm.fused_adj_matmul_int4_t
        else:
            m_pad = fusedmm.pad_matrix(m, fusedmm.TI)
            mat = jnp.asarray(m_pad)
            call = fusedmm.fused_adj_matmul_int8_t
        UP, IP = m_pad.shape
        mat_bytes = mat.nbytes
        for d in (64, 128, 192, 256):
            need_yi = IP * d * 4
            need_yu = UP * d * 4
            old_yi, old_yu = fusedmm.MAX_YI_VMEM_BYTES, fusedmm.MAX_YU_VMEM_BYTES
            fusedmm.MAX_YI_VMEM_BYTES = max(old_yi, need_yi + 1)
            try:
                quT = jnp.asarray(rng.integers(-7, 8, (d, UP)), jnp.int8)
                qiT = jnp.asarray(rng.integers(-7, 8, (d, IP)), jnp.int8)
                try:
                    dt = scan_time(call, (mat, quT, qiT))
                    macs = 2 * UP * IP * d
                    print(f"{quant} T d={d:4d}  {dt*1e3:7.3f} ms  "
                          f"{mat_bytes/dt/1e9:5.0f} GB/s(mat)  "
                          f"{2*macs/dt/1e12:6.1f} TOP/s  "
                          f"(yi_acc {need_yi/2**20:.1f} MB)", flush=True)
                except Exception as e:
                    print(f"{quant} T d={d:4d}  FAILED: {type(e).__name__}: "
                          f"{str(e).splitlines()[0][:140]}", flush=True)
            finally:
                fusedmm.MAX_YI_VMEM_BYTES, fusedmm.MAX_YU_VMEM_BYTES = old_yi, old_yu


if __name__ == "__main__":
    main()
