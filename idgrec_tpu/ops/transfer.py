"""Host→device transfer helper for large arrays.

A single `jax.device_put` of a multi-GB buffer degrades badly over
networked device transports (measured on the tunneled v5e: 1 GiB whole
≈ 170 MB/s, 4.8 GiB whole ≈ 12 MB/s, 128 MiB chunks ≈ 420 MB/s —
the transport pipelines small transfers but serializes one huge one).
`device_put_chunked` splits the host array into row chunks, issues the
async puts back-to-back, and concatenates on device. Peak device
memory is 2× the array during the concat; callers move multi-GB
adjacency matrices at startup where that headroom exists.

The reference has no equivalent concern (single local GPU,
models/LightGCN.py:31-32 moves the graph with one `.to(device)`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

CHUNK_BYTES = 128 * 1024 * 1024


def device_put_chunked(x: np.ndarray, device=None, chunk_bytes: int = CHUNK_BYTES):
    """`jax.device_put` split into row chunks for large arrays."""
    x = np.asarray(x)
    if x.nbytes <= chunk_bytes or x.ndim == 0 or x.shape[0] <= 1:
        return jax.device_put(x, device)
    row_bytes = x.nbytes // x.shape[0]
    rows = max(1, chunk_bytes // max(1, row_bytes))
    parts = [
        jax.device_put(x[i : i + rows], device) for i in range(0, x.shape[0], rows)
    ]
    if len(parts) == 1:
        return parts[0]
    return jnp.concatenate(parts, axis=0)
