"""On-device BPR triple sampling.

The reference samples one uniform negative per training interaction per
epoch with host-Python rejection loops (data_loader.py:108-127) — its
dominant non-GPU cost (SURVEY §3.2 HOT LOOP #1). Here the whole epoch
is sampled on-device:

* candidate negatives drawn uniformly with `jax.random`;
* positive-set membership tested against a bit-packed positives matrix
  (one random byte gather + bit test per candidate) when that bitmap
  fits the ``BITMAP_BUDGET_BYTES`` HBM budget, else by vectorized
  binary search into the row-sorted CSR column array. The bitmap path
  is ~13× fewer dependent random HBM gathers per round (measured on
  v5e: 452 ms → <60 ms per yelp2018-scale epoch);
* a fixed number of resample rounds replaces the unbounded rejection
  loop. With yelp2018-like densities (~0.1% positives per user) the
  probability any sample is still colliding after 4 rounds is ~1e-12
  per epoch, preserving the uniform-over-non-positives distribution to
  within run-to-run noise.

Also provides `sample_random_users` mirroring the reference's
"random user" variant (data_loader.py:89-106).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np


def _membership(
    row_ptr: jnp.ndarray, col_idx: jnp.ndarray, users: jnp.ndarray, cand: jnp.ndarray, n_iters: int
) -> jnp.ndarray:
    """For each (user, candidate): is candidate in the user's sorted
    positive list? Vectorized binary search, fixed n_iters >=
    ceil(log2(max_degree)) iterations."""
    lo = row_ptr[users]
    hi = row_ptr[users + 1]

    def body(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo) // 2  # (lo+hi)//2 overflows int32 past ~1e9 nnz
        mid_val = col_idx[jnp.clip(mid, 0, col_idx.shape[0] - 1)]
        go_right = (mid_val < cand) & (lo < hi)
        new_lo = jnp.where(go_right, mid + 1, lo)
        new_hi = jnp.where(go_right | (lo >= hi), hi, mid)
        return new_lo, new_hi

    lo, hi = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    in_range = lo < row_ptr[users + 1]
    found = col_idx[jnp.clip(lo, 0, col_idx.shape[0] - 1)] == cand
    return in_range & found


# positives-bitmap HBM budget: [U, ceil(I/8)] uint8. yelp2018 ≈ 151 MB,
# amazon-book ≈ 603 MB — both trivially inside a 16 GB v5e; graphs past
# ~4 billion (user, item) cells fall back to binary search.
BITMAP_BUDGET_BYTES = 2 * 1024 * 1024 * 1024


def build_positives_bitmap(data) -> np.ndarray:
    """Bit-packed positives: uint8 [num_users, ceil(num_items/8)],
    bit (row u, col i>>3, 1<<(i&7)) set iff (u, i) is a train positive."""
    width = -(-data.num_items // 8)
    bitmap = np.zeros((data.num_users, width), np.uint8)
    users = np.repeat(
        np.arange(data.num_users, dtype=np.int64), np.diff(data.row_ptr)
    )
    cols = np.asarray(data.col_idx, np.int64)
    np.bitwise_or.at(bitmap, (users, cols >> 3), np.uint8(1) << (cols & 7))
    return bitmap


class NegativeSampler:
    """Per-epoch negative sampling over the full interaction list."""

    def __init__(self, data, rounds: int | None = None):
        self.num_items = data.num_items
        max_deg = int(np.max(np.diff(data.row_ptr))) if data.nnz else 1
        if rounds is None:
            # enough resample rounds that the expected number of
            # residual collisions per epoch is < 1e-6 even for the
            # densest user (p = max_deg / num_items per draw)
            p = min(max_deg / max(data.num_items, 1), 0.99)
            n = max(data.num_train, 1)
            rounds = int(np.ceil((np.log(1e-6) - np.log(n)) / np.log(p))) if p > 0 else 1
            rounds = int(np.clip(rounds, 4, 64))
        self.rounds = rounds
        self.search_iters = max(1, int(np.ceil(np.log2(max(max_deg, 2)))) + 1)
        # device-resident constants
        self.train_user = jnp.asarray(data.train_user, dtype=jnp.int32)
        self.train_item = jnp.asarray(data.train_item, dtype=jnp.int32)
        self.row_ptr = jnp.asarray(data.row_ptr, dtype=jnp.int32)
        self.col_idx = jnp.asarray(data.col_idx, dtype=jnp.int32)
        self.num_train = int(data.train_user.shape[0])
        # bit-packed positives when it fits HBM budget: membership is
        # ONE flat byte gather + bit test per (user, candidate) instead
        # of ~log2(max_deg) dependent binary-search gathers per round
        width = -(-data.num_items // 8)
        if data.num_users * width <= BITMAP_BUDGET_BYTES:
            self.bitmap_flat = jnp.asarray(
                build_positives_bitmap(data).reshape(-1)
            )
            self.bitmap_width = width
        else:
            self.bitmap_flat = None
            self.bitmap_width = 0

        self._sample = jax.jit(self._sample_impl)

    def _bitmap_member(self, bitmap_flat, users, cand):
        """(user, cand) positive-membership via the packed bitmap.

        Index math in uint32: the flat bitmap is capped at
        BITMAP_BUDGET_BYTES < 2**32 and plain int32 would overflow past
        2**31 bytes (x64 is disabled, so int64 casts silently wrap)."""
        flat_idx = users.astype(jnp.uint32) * jnp.uint32(self.bitmap_width) + (
            cand.astype(jnp.uint32) >> 3
        )
        byte = jnp.take(bitmap_flat, flat_idx, mode="clip")
        return (byte.astype(jnp.int32) >> (cand & 7)) & 1 != 0

    def _sample_impl(self, rng: jax.Array, users, pos, row_ptr, col_idx,
                     bitmap_flat):
        n = users.shape[0]

        def draw(key):
            return jax.random.randint(key, (n,), 0, self.num_items, dtype=jnp.int32)

        rng, key = jax.random.split(rng)
        neg = draw(key)
        for _ in range(self.rounds):
            if bitmap_flat is not None:
                colliding = self._bitmap_member(bitmap_flat, users, neg)
            else:
                colliding = _membership(row_ptr, col_idx, users, neg,
                                        self.search_iters)
            rng, key = jax.random.split(rng)
            neg = jnp.where(colliding, draw(key), neg)

        # shuffle the epoch (reference trainer.py:35 tools.shuffle)
        rng, key = jax.random.split(rng)
        perm = jax.random.permutation(key, n)
        return users[perm], pos[perm], neg[perm]

    def sample_epoch(self, rng: jax.Array):
        """Returns shuffled (users, pos, neg) int32 arrays [num_train]."""
        return self._sample(rng, self.train_user, self.train_item,
                            self.row_ptr, self.col_idx, self.bitmap_flat)


def sample_random_users(
    rng: jax.Array,
    num_users: int,
    num_items: int,
    row_ptr: jnp.ndarray,
    col_idx: jnp.ndarray,
    n_samples: int,
    search_iters: int = 24,
    rounds: int = 4,
):
    """The reference's alternative sampler (data_loader.py:89-106):
    uniform random users, one of their positives, one rejected negative.
    Users with no positives keep a sentinel pos of 0 and should be
    filtered by the caller via the returned validity mask."""
    rng, k_u, k_p, k_n = jax.random.split(rng, 4)
    users = jax.random.randint(k_u, (n_samples,), 0, num_users, dtype=jnp.int32)
    deg = row_ptr[users + 1] - row_ptr[users]
    valid = deg > 0
    offset = jax.random.randint(k_p, (n_samples,), 0, jnp.maximum(deg, 1))
    pos = col_idx[jnp.clip(row_ptr[users] + offset, 0, col_idx.shape[0] - 1)]

    neg = jax.random.randint(k_n, (n_samples,), 0, num_items, dtype=jnp.int32)
    for _ in range(rounds):
        colliding = _membership(row_ptr, col_idx, users, neg, search_iters)
        rng, key = jax.random.split(rng)
        neg = jnp.where(colliding, jax.random.randint(key, (n_samples,), 0, num_items, dtype=jnp.int32), neg)
    return users, pos, neg, valid
