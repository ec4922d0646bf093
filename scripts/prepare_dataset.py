"""Convert raw interaction data to the reference dataset format.

The framework (like the reference, data_loader.py:48-70) consumes
`train.txt`/`test.txt` with one line per user: `uid iid iid ...`,
0-based contiguous ids. Public recsys dumps are usually (user, item[,
rating][, timestamp]) tuples — this tool densifies ids, filters by
rating threshold and k-core, splits per user, and writes the two
files.

Examples:
  python scripts/prepare_dataset.py ratings.csv out_dir \
      --cols 0,1 --delim , --test-ratio 0.2
  python scripts/prepare_dataset.py ml-1m/ratings.dat out_dir \
      --delim :: --cols 0,1,2 --min-rating 4 --k-core 10
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def k_core_filter(users: np.ndarray, items: np.ndarray, k: int):
    """Iteratively drop users/items with fewer than k interactions."""
    while True:
        uc = np.bincount(users)
        ic = np.bincount(items)
        keep = (uc[users] >= k) & (ic[items] >= k)
        if keep.all():
            return users, items
        users, items = users[keep], items[keep]
        if users.size == 0:
            raise SystemExit("k-core filtering removed every interaction")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="raw interactions file")
    ap.add_argument("out_dir")
    ap.add_argument("--delim", default=",", help="field delimiter (e.g. ',', '\\t', '::')")
    ap.add_argument("--cols", default="0,1",
                    help="column indices: user,item[,rating]")
    ap.add_argument("--min-rating", type=float, default=None,
                    help="keep rows with rating >= threshold (needs a rating col)")
    ap.add_argument("--k-core", type=int, default=0,
                    help="iteratively drop users/items with < k interactions")
    ap.add_argument("--test-ratio", type=float, default=0.2,
                    help="per-user fraction of interactions held out for test")
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--header", action="store_true", help="skip the first line")
    args = ap.parse_args()

    cols = [int(c) for c in args.cols.split(",")]
    u_col, i_col = cols[0], cols[1]
    r_col = cols[2] if len(cols) > 2 else None

    users, items = [], []
    with open(args.src, "r", encoding="utf-8") as f:
        if args.header:
            next(f)
        for line in f:
            parts = line.rstrip("\n").split(args.delim)
            if len(parts) <= max(u_col, i_col):
                continue
            if args.min_rating is not None:
                if r_col is None or float(parts[r_col]) < args.min_rating:
                    continue
            users.append(parts[u_col])
            items.append(parts[i_col])
    if not users:
        raise SystemExit("no interactions parsed — check --delim/--cols")

    _, u_ids = np.unique(np.asarray(users), return_inverse=True)
    _, i_ids = np.unique(np.asarray(items), return_inverse=True)
    # dedup (user, item) pairs: the reference format is binary
    pair = u_ids.astype(np.int64) * (i_ids.max() + 1) + i_ids
    _, first = np.unique(pair, return_index=True)
    first.sort()
    u_ids, i_ids = u_ids[first], i_ids[first]

    if args.k_core > 0:
        u_ids, i_ids = k_core_filter(u_ids, i_ids, args.k_core)
        # re-densify after filtering
        _, u_ids = np.unique(u_ids, return_inverse=True)
        _, i_ids = np.unique(i_ids, return_inverse=True)

    rng = np.random.default_rng(args.seed)
    num_users = int(u_ids.max()) + 1
    order = np.argsort(u_ids, kind="stable")
    u_sorted, i_sorted = u_ids[order], i_ids[order]
    bounds = np.searchsorted(u_sorted, np.arange(num_users + 1))

    os.makedirs(args.out_dir, exist_ok=True)
    n_train = n_test = 0
    with open(os.path.join(args.out_dir, "train.txt"), "w") as ftr, \
         open(os.path.join(args.out_dir, "test.txt"), "w") as fte:
        for u in range(num_users):
            its = i_sorted[bounds[u] : bounds[u + 1]]
            if its.size == 0:
                continue
            perm = rng.permutation(its.size)
            n_hold = int(round(args.test_ratio * its.size))
            n_hold = min(n_hold, its.size - 1)  # keep >= 1 train item
            test_it = its[perm[:n_hold]]
            train_it = its[perm[n_hold:]]
            ftr.write(f"{u} " + " ".join(map(str, sorted(train_it))) + "\n")
            n_train += train_it.size
            if test_it.size:
                fte.write(f"{u} " + " ".join(map(str, sorted(test_it))) + "\n")
                n_test += test_it.size
    print(
        f"wrote {args.out_dir}: {num_users} users, {int(i_ids.max()) + 1} items, "
        f"{n_train} train / {n_test} test interactions",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
