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


def build_meta(tree, model_width: int):
    """Pytree matching `tree` with the TRUE row count for every leaf
    that is stored padded (2-D, at least 2·width rows, not already a
    128-multiple), else the _NO_PAD sentinel (kept an int so the meta
    tree has the same structure as the data tree)."""

    def leaf(x):
        if (
            hasattr(x, "ndim")
            and x.ndim == 2
            and x.shape[0] >= 2 * model_width
            and x.shape[0] % _PAD != 0
        ):
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
