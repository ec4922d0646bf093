"""On-device k-means (Lloyd's iterations) for NCL's prototype E-step.

The reference round-trips embeddings to CPU and clusters with faiss
each epoch ≥ 20 (models/NCL.py:66-81,177-178 — a device↔host boundary
per epoch). Here clustering runs on-device as jitted Lloyd iterations:
assignment via a [N, k] distance matmul (MXU-friendly), update via
segment-sum means. Empty clusters keep their previous centroid.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(rng: jax.Array, x: jnp.ndarray, k: int, iters: int = 20):
    """Cluster x [N, d] into k centroids.

    Returns (centroids [k, d], assignment [N] int32).
    Init: k distinct random rows (faiss-style random-point init).
    """
    n = x.shape[0]
    x = x.astype(jnp.float32)
    init_idx = jax.random.choice(rng, n, (k,), replace=False)
    centroids = x[init_idx]

    x_sq = jnp.sum(x * x, axis=1, keepdims=True)  # [N, 1]

    def assign(centroids):
        c_sq = jnp.sum(centroids * centroids, axis=1)  # [k]
        # ||x - c||^2 = x² - 2 x·c + c²; argmin over c
        logits = 2.0 * jnp.matmul(x, centroids.T, precision=jax.lax.Precision.HIGHEST)
        d2 = x_sq - logits + c_sq[None, :]
        return jnp.argmin(d2, axis=1).astype(jnp.int32)

    def body(_, centroids):
        a = assign(centroids)
        sums = jax.ops.segment_sum(x, a, num_segments=k)
        counts = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), a, num_segments=k)
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where(counts[:, None] > 0, means, centroids)

    centroids = jax.lax.fori_loop(0, iters, body, centroids)
    return centroids, assign(centroids)
