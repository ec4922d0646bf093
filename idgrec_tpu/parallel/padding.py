"""Row-padded storage for sharded training state.

`jax.device_put` (and explicit in/out shardings) reject uneven row
sharding, so real-world embedding tables (yelp2018: 31,668 / 38,048
rows — reference models/LightGCN.py:21-24) cannot be row-sharded
as-is. The engine therefore STORES every large [N, d] leaf of
params / optimizer state / model state zero-padded to a 128-row
multiple (shardable over any power-of-two model axis ≤ 128, matching
the adjacency padding in ops/propagate.py) and slices back to the true
row count inside the jitted step before any model code sees it:

    stored   [N_pad, d]  —  P('model', None), 1/width rows per chip
    compute  [N, d]      —  true shape, models unchanged

Zero pad rows receive zero gradients (autodiff of the slice pads
cotangents with zeros) and therefore zero Adam updates, so they stay
zero forever; numerics are identical to unpadded training (pinned by
tests/test_parallel.py). Without a mesh the meta is all-None and
pad/unpad are identity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_PAD = 128


def _pad_to(n: int) -> int:
    return -(-n // _PAD) * _PAD


_NO_PAD = -1  # meta sentinel: leaf stored at its natural shape


def build_meta(tree, model_width: int, node_rows=None):
    """Pytree matching `tree` with the TRUE row count for every leaf
    that is stored padded, else the _NO_PAD sentinel (kept an int so
    the meta tree has the same structure as the data tree).

    ``node_rows``: when given (a set of row counts — num_users,
    num_items, their sum), ONLY leaves whose leading dim matches are
    padded; this keeps small dense weight matrices (e.g. HCCF's
    [d, hyper] tables) at natural shape instead of wastefully padding
    and row-sharding them. Without it, the size heuristic pads any 2-D
    leaf with at least 2·width rows."""

    def leaf(x):
        if not (hasattr(x, "ndim") and x.ndim == 2 and x.shape[0] % _PAD != 0):
            return _NO_PAD
        if node_rows is not None:
            return x.shape[0] if x.shape[0] in node_rows else _NO_PAD
        if x.shape[0] >= 2 * model_width:
            return x.shape[0]
        return _NO_PAD

    return jax.tree.map(leaf, tree)


def is_identity(meta) -> bool:
    return all(n == _NO_PAD for n in jax.tree.leaves(meta))


def pad_tree(tree, meta):
    def leaf(x, n):
        if n == _NO_PAD:
            return x
        return jnp.pad(x, ((0, _pad_to(n) - n), (0, 0)))

    return jax.tree.map(leaf, tree, meta)


def unpad_tree(tree, meta):
    def leaf(x, n):
        if n == _NO_PAD:
            return x
        return x[:n]

    return jax.tree.map(leaf, tree, meta)
