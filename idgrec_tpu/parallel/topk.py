"""Distributed top-k with the item axis kept sharded.

The [B, I] score matrix is constrained to P(None, 'model') — GSPMD
then shards the producing matmul so each chip holds a [B, I/N] column
slice and the item-side representation is never all-gathered. Each
chip takes a LOCAL top-k over its columns, and one tiny all_gather of
(val, idx) candidate pairs ([N, B, k], k = max(topK) ≤ 40 for eval,
request-k for serving) feeds the final merge — the distributed
counterpart of the reference's single-GPU
``torch.topk(rating, max(topK))`` (batch_test.py:68).

Shared by the evaluator (full-catalog metrics) and the serving
``Recommender`` (filtered recommendation requests).

Tie semantics match replicated ``lax.top_k``: candidates are merged in
(shard, local rank) order, so equal values resolve to the lowest
global item index on every path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

_MODEL_AXIS = "model"
# strictly BELOW the evaluator/serving mask value (-1e9): approx_max_k
# gives no tie-order guarantee, so a pad column tying with masked items
# could surface fabricated item ids >= num_items
_PAD_VALUE = -2e9


def items_sharded(mesh) -> bool:
    return mesh is not None and int(mesh.shape.get(_MODEL_AXIS, 1)) > 1


def sharded_topk(ratings: jnp.ndarray, mesh, k: int, approx: bool = False):
    """(values [B, k], indices [B, k]) of the row-wise top-k with the
    item axis sharded over the mesh's 'model' axis. Columns are padded
    below any reachable score so the pad never wins."""
    n = int(mesh.shape[_MODEL_AXIS])
    b, i = ratings.shape
    pad = (-i) % n
    if pad:
        ratings = jnp.pad(ratings, ((0, 0), (0, pad)), constant_values=_PAD_VALUE)
    ratings = jax.lax.with_sharding_constraint(
        ratings, NamedSharding(mesh, P(None, _MODEL_AXIS))
    )

    def body(r_k):
        width = r_k.shape[1]
        kk = min(k, width)
        if approx and width > kk:
            # same recall_target as the single-chip evaluator path
            # (evaluator.py): 0.99 holds @20 metrics within 1e-3 of
            # exact on measured score distributions
            vals, idx = jax.lax.approx_max_k(r_k, kk, recall_target=0.99)
        else:
            vals, idx = jax.lax.top_k(r_k, kk)
        idx = idx + jax.lax.axis_index(_MODEL_AXIS) * width
        vals_all = jax.lax.all_gather(vals, _MODEL_AXIS)  # [N, B, kk]
        idx_all = jax.lax.all_gather(idx, _MODEL_AXIS)
        vals_c = jnp.moveaxis(vals_all, 0, 1).reshape(b, -1)
        idx_c = jnp.moveaxis(idx_all, 0, 1).reshape(b, -1)
        top_vals, sel = jax.lax.top_k(vals_c, k)
        return top_vals, jnp.take_along_axis(idx_c, sel, axis=1)

    return jax.shard_map(
        body, mesh=mesh, in_specs=P(None, _MODEL_AXIS), out_specs=P(),
        check_vma=False,
    )(ratings)
