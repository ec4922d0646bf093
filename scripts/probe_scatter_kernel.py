"""Can a Pallas scatter-add beat XLA's ~45 ns/row TPU scatter?

The one remaining named non-chain step cost is the BPR batch-cotangent
row scatter (~0.29 ms for 6144 rows into [N, 64] — docs/SCALING.md
round-5 attribution). This probe measures a VMEM-resident prototype:
zero (or copy) the whole table in VMEM, sequentially read-modify-write
one [1, d] row per loop iteration (duplicates accumulate correctly by
sequential order), DMA the table out once.

Outcome decides whether ops-level wiring (a custom-VJP gather whose
backward is the Pallas scatter) is worth it.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from idgrec_tpu.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, D, B = 69_716, 64, 6144
N_PAD = -(-N // 8) * 8


def _scatter_kernel(idx_ref, vals_ref, out_ref, tbl, sem):
    def body(b, _):
        row = idx_ref[b]
        tbl[pl.ds(row, 1), :] += vals_ref[pl.ds(b, 1), :]
        return 0

    tbl[...] = jnp.zeros_like(tbl)
    jax.lax.fori_loop(0, vals_ref.shape[0], body, 0)
    cp = pltpu.make_async_copy(tbl, out_ref, sem)
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnums=())
def pallas_scatter(idx, vals):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((B, D), lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.VMEM((N_PAD, D), jnp.float32),
                        pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _scatter_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_PAD, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=2 * N_PAD * D * 4 + 12 * 1024 * 1024,
        ),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(idx, vals)


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from profile_step import chain_time

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, B), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(B, D)).astype(np.float32))

    # correctness vs XLA scatter
    want = np.zeros((N_PAD, D), np.float32)
    np.add.at(want, np.asarray(idx), np.asarray(vals))
    got = np.asarray(pallas_scatter(idx, vals))
    err = np.abs(got - want).max()
    print(f"correctness max err: {err:.2e}", flush=True)
    assert err < 1e-4

    def fn_pallas(v, idx):
        out = pallas_scatter(idx, v * 1.000001)
        return (v * 0.999 + out[:B] * 1e-6,)

    def fn_xla(v, idx):
        out = jnp.zeros((N_PAD, D), jnp.float32).at[idx].add(v * 1.000001)
        return (v * 0.999 + out[:B] * 1e-6,)

    chain_time("xla scatter 6144", fn_xla, vals, idx, steps=100)
    chain_time("pallas scatter 6144", fn_pallas, vals, idx, steps=100)


if __name__ == "__main__":
    main()
