"""Interaction dataset loader.

Reads the reference's dataset format — one line per user,
``uid iid iid ...`` separated by spaces (reference
utility/utility_data/data_loader.py:48-70, dataset/yelp2018/test.txt) —
and produces:

* a CSR user->item interaction structure as flat int32 numpy arrays
  (``row_ptr``/``col_idx``), JAX-ready;
* the per-user positive-item lists and the test ground-truth mapping;
* identical dataset statistics to the reference
  (data_loader.py:72-86), used as a golden-trace parity point;
* the 4-quartile sparsity split of test users
  (data_loader.py:161-204) for the sparsity study.

Semantics preserved from the reference loader:

* ``num_users``/``num_items`` are max-id+1 over *both* train and test
  files (data_loader.py:31-36 — ``read_ratings`` updates the running max
  for each file read);
* users whose line has no positive items are recorded in the
  unique-user list but contribute nothing else (data_loader.py:59-61);
* duplicate (user, item) pairs are kept in the interaction count
  (they sum in the CSR build, data_loader.py:42-43).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np


def _parse_interaction_file(path: str) -> tuple[np.ndarray, np.ndarray, np.ndarray, list[int]]:
    """Parse one train/test file.

    Returns (unique_users, inter_users, inter_items, pos_lengths) where
    inter_* are the flattened (user, item) interaction pairs in file
    order. Uses the native mmap scanner (idgrec_tpu.data.native) when
    available — ~20× the Python path at yelp2018 scale — with this
    Python implementation as the fallback and the equivalence oracle.
    """
    from idgrec_tpu.data import native

    parsed = native.parse_ratings(path) if os.path.exists(path) else None
    if parsed is not None:
        inter_users, inter_items = parsed
        # per-line positive counts = run lengths of the user column
        # (reference format has one line per user)
        if inter_users.size:
            boundaries = np.flatnonzero(np.diff(inter_users) != 0) + 1
            groups = np.split(inter_users, boundaries)
            pos_lengths = [int(g.size) for g in groups]
            unique_users = np.asarray([int(g[0]) for g in groups], np.int64)
        else:
            pos_lengths = []
            unique_users = np.zeros(0, np.int64)
        return unique_users, inter_users, inter_items, pos_lengths

    with open(path, "r") as f:
        raw = f.read()

    unique_users: list[int] = []
    users: list[np.ndarray] = []
    items: list[np.ndarray] = []
    pos_lengths: list[int] = []
    for line in raw.split("\n"):
        line = line.strip()
        if not line:
            continue
        arr = np.array(line.split(), dtype=np.int64)
        uid = int(arr[0])
        unique_users.append(uid)
        if arr.size < 2:
            continue
        pos = arr[1:]
        users.append(np.full(pos.size, uid, dtype=np.int64))
        items.append(pos)
        pos_lengths.append(int(pos.size))

    inter_users = np.concatenate(users) if users else np.zeros(0, dtype=np.int64)
    inter_items = np.concatenate(items) if items else np.zeros(0, dtype=np.int64)
    return np.asarray(unique_users, dtype=np.int64), inter_users, inter_items, pos_lengths


def _csr_from_pairs(users: np.ndarray, items: np.ndarray, num_users: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build (row_ptr, col_idx, values) CSR from (user, item) pairs.

    Duplicate pairs are summed, matching scipy's ``csr_matrix(... ).sum``
    behavior used by the reference (data_loader.py:42-43). ``col_idx``
    is sorted within each row.
    """
    order = np.lexsort((items, users))
    u = users[order]
    i = items[order]
    if u.size:
        # collapse duplicates
        first = np.ones(u.size, dtype=bool)
        first[1:] = (u[1:] != u[:-1]) | (i[1:] != i[:-1])
        uu = u[first]
        ii = i[first]
        counts = np.diff(np.append(np.nonzero(first)[0], u.size))
        vals = counts.astype(np.float32)
    else:
        uu = u
        ii = i
        vals = np.zeros(0, dtype=np.float32)
    # bincount beats the buffered-ufunc np.add.at by >10x at
    # million-edge scale
    counts = np.bincount(uu, minlength=num_users) if uu.size else np.zeros(num_users, np.int64)
    row_ptr = np.concatenate([[0], np.cumsum(counts)])
    return row_ptr.astype(np.int32), ii.astype(np.int32), vals


@dataclass
class Dataset:
    """Loaded interaction data for one benchmark dataset."""

    path: str
    name: str
    num_users: int
    num_items: int
    num_train: int
    num_test: int
    # flattened training interactions (file order; duplicates kept)
    train_user: np.ndarray  # int64 [num_train]
    train_item: np.ndarray  # int64 [num_train]
    # CSR over unique (user,item) training pairs, cols sorted per row
    row_ptr: np.ndarray  # int32 [num_users + 1]
    col_idx: np.ndarray  # int32 [nnz]
    csr_vals: np.ndarray  # float32 [nnz] (multiplicity)
    # test ground truth
    test_user: np.ndarray  # int64 [num_test]
    test_item: np.ndarray  # int64 [num_test]
    pos_length: list[int] = field(default_factory=list)
    _test_dict: dict[int, list[int]] | None = None
    _all_positive: list[np.ndarray] | None = None

    # ------------------------------------------------------------------
    @property
    def num_nodes(self) -> int:
        return self.num_users + self.num_items

    @property
    def nnz(self) -> int:
        return int(self.col_idx.size)

    @classmethod
    def load(cls, path: str, name: str | None = None) -> "Dataset":
        """Load ``<path>/train.txt`` and ``<path>/test.txt``."""
        train_path = os.path.join(path, "train.txt")
        test_path = os.path.join(path, "test.txt")
        _, train_user, train_item, pos_length = _parse_interaction_file(train_path)
        _, test_user, test_item, _ = _parse_interaction_file(test_path)

        # max-id+1 over both files, computed from INTERACTING pairs
        # only — the reference's itemless-line `continue` comes BEFORE
        # its max-id update (data_loader.py:58-63), so a uid with no
        # items never raises num_users there either
        num_users = 0
        num_items = 0
        for u_arr, i_arr in ((train_user, train_item), (test_user, test_item)):
            if u_arr.size:
                num_users = max(num_users, int(u_arr.max()))
                num_items = max(num_items, int(i_arr.max()))
        num_users += 1
        num_items += 1

        row_ptr, col_idx, csr_vals = _csr_from_pairs(train_user, train_item, num_users)
        return cls(
            path=path,
            name=name or os.path.basename(os.path.normpath(path)),
            num_users=num_users,
            num_items=num_items,
            num_train=int(train_user.size),
            num_test=int(test_user.size),
            train_user=train_user,
            train_item=train_item,
            row_ptr=row_ptr,
            col_idx=col_idx,
            csr_vals=csr_vals,
            test_user=test_user,
            test_item=test_item,
            pos_length=pos_length,
        )

    @classmethod
    def from_pairs(
        cls,
        train_user: np.ndarray,
        train_item: np.ndarray,
        test_user: np.ndarray,
        test_item: np.ndarray,
        num_users: int | None = None,
        num_items: int | None = None,
        name: str = "synthetic",
        path: str = "",
    ) -> "Dataset":
        """Build a Dataset from in-memory interaction pairs."""
        train_user = np.asarray(train_user, dtype=np.int64)
        train_item = np.asarray(train_item, dtype=np.int64)
        test_user = np.asarray(test_user, dtype=np.int64)
        test_item = np.asarray(test_item, dtype=np.int64)
        nu, ni = 0, 0
        for u_arr, i_arr in ((train_user, train_item), (test_user, test_item)):
            if u_arr.size:
                nu = max(nu, int(u_arr.max()))
                ni = max(ni, int(i_arr.max()))
        num_users = num_users if num_users is not None else nu + 1
        num_items = num_items if num_items is not None else ni + 1
        row_ptr, col_idx, csr_vals = _csr_from_pairs(train_user, train_item, num_users)
        return cls(
            path=path,
            name=name,
            num_users=num_users,
            num_items=num_items,
            num_train=int(train_user.size),
            num_test=int(test_user.size),
            train_user=train_user,
            train_item=train_item,
            row_ptr=row_ptr,
            col_idx=col_idx,
            csr_vals=csr_vals,
            test_user=test_user,
            test_item=test_item,
            pos_length=[],
        )

    # ------------------------------------------------------------------
    @property
    def sparsity(self) -> float:
        return 1 - (self.num_train + self.num_test) / self.num_users / self.num_items

    def get_statistics(self) -> str:
        """Stats line in the exact format of the reference
        (data_loader.py:80-86) — the committed-log golden-trace header."""
        strs = "dataset:" + self.name + "\t"
        strs += "num_users:%d, num_items:%d \t" % (self.num_users, self.num_items)
        strs += "|num_train:%d, num_test:%d, sparsity: %.6f" % (
            self.num_train,
            self.num_test,
            self.sparsity,
        )
        return strs

    # ------------------------------------------------------------------
    def positive_items(self, user: int) -> np.ndarray:
        """Sorted unique positive item ids of one user."""
        return self.col_idx[self.row_ptr[user] : self.row_ptr[user + 1]]

    @property
    def all_positive(self) -> list[np.ndarray]:
        """Per-user positive lists (data_loader.py:45,129-133)."""
        if self._all_positive is None:
            self._all_positive = [self.positive_items(u) for u in range(self.num_users)]
        return self._all_positive

    @property
    def test_dict(self) -> dict[int, list[int]]:
        """Test ground truth mapping (data_loader.py:151-159)."""
        if self._test_dict is None:
            d: dict[int, list[int]] = {}
            for u, i in zip(self.test_user.tolist(), self.test_item.tolist()):
                d.setdefault(u, []).append(i)
            self._test_dict = d
        return self._test_dict

    def padded_test_truth(self, users: np.ndarray, pad: int = -1) -> np.ndarray:
        """[len(users), max_truth] ground-truth item ids padded with -1."""
        lists = [self.test_dict.get(int(u), []) for u in users]
        width = max((len(l) for l in lists), default=1) or 1
        out = np.full((len(users), width), pad, dtype=np.int32)
        for r, l in enumerate(lists):
            out[r, : len(l)] = l
        return out

    # ------------------------------------------------------------------
    def create_sparsity_split(self) -> tuple[list[list[int]], list[str]]:
        """Quartile split of test users by interaction count.

        Mirrors data_loader.py:161-204 including its accounting quirks
        (boundary handling and the trailing split emission) so sparsity
        studies are comparable.
        """
        all_users = list(self.test_dict.keys())
        user_n_iid: dict[int, list[int]] = {}
        for uid in all_users:
            num_iids = len(self.positive_items(uid)) + len(self.test_dict[uid])
            user_n_iid.setdefault(num_iids, []).append(uid)

        split_uids: list[list[int]] = []
        split_state: list[str] = []
        temp: list[int] = []
        count = 1
        n_count = self.num_train + self.num_test
        n_rates = 0
        for idx, n_iids in enumerate(sorted(user_n_iid)):
            temp += user_n_iid[n_iids]
            n_rates += n_iids * len(user_n_iid[n_iids])
            n_count -= n_iids * len(user_n_iid[n_iids])
            if n_rates >= count * 0.25 * (self.num_train + self.num_test):
                split_uids.append(temp)
                state = "\t #inter per user<=[%d], #users=[%d], #all rates=[%d]" % (
                    n_iids,
                    len(temp),
                    n_rates,
                )
                split_state.append(state)
                temp = []
                n_rates = 0
            if idx == len(user_n_iid) - 1 or n_count == 0:
                split_uids.append(temp)
                state = "\t #inter per user<=[%d], #users=[%d], #all rates=[%d]" % (
                    n_iids,
                    len(temp),
                    n_rates,
                )
                split_state.append(state)
        return split_uids, split_state

    # ------------------------------------------------------------------
    def to_scipy_csr(self):
        """The user-item interaction matrix as ``scipy.sparse.csr_matrix``
        (parity with data_loader.py:42-43; values are multiplicities)."""
        import scipy.sparse as sp

        return sp.csr_matrix(
            (self.csr_vals, self.col_idx, self.row_ptr),
            shape=(self.num_users, self.num_items),
        )

    def dense_user_rows(self, users: np.ndarray) -> np.ndarray:
        """Densified interaction rows (for the CVGA per-user VAE path,
        reference models/CVGA.py:130-134)."""
        out = np.zeros((len(users), self.num_items), dtype=np.float32)
        for r, u in enumerate(users):
            start, end = self.row_ptr[u], self.row_ptr[u + 1]
            out[r, self.col_idx[start:end]] = self.csr_vals[start:end]
        return out


def make_synthetic_dataset(
    num_users: int,
    num_items: int,
    num_train: int,
    num_test: int,
    seed: int = 0,
    name: str = "synthetic",
) -> Dataset:
    """A power-law-ish random bipartite dataset for tests and benchmarks.

    Used because the reference snapshot ships test.txt but not train.txt
    for its benchmark datasets (.MISSING_LARGE_BLOBS). Scale defaults in
    bench.py mirror yelp2018 (31,668 users / 38,048 items / 1.24M train).
    """
    rng = np.random.default_rng(seed)
    # Zipf-like item popularity for realistic degree skew.
    item_p = (1.0 / np.arange(1, num_items + 1)) ** 0.8
    item_p /= item_p.sum()
    def unique_pairs(n: int) -> tuple[np.ndarray, np.ndarray]:
        """Sample n UNIQUE (user, item) pairs — reference train files
        list each interaction once (data_loader.py:38-43), so the
        interaction matrix is binary; duplicates would silently flip
        the propagation backend off its binary fast path."""
        total = num_users * num_items
        n = min(n, total)
        if total <= 4_000_000 and n > total // 8:
            # near-saturation (tiny test graphs): skewed rejection
            # sampling converges too slowly — sample pair ids exactly
            flat = rng.choice(total, size=n, replace=False)
            return flat // num_items, flat % num_items
        users = np.empty(0, np.int64)
        items = np.empty(0, np.int64)
        while users.size < n:
            k = int((n - users.size) * 1.2) + 16
            u = rng.integers(0, num_users, k)
            i = rng.choice(num_items, size=k, p=item_p)
            users = np.concatenate([users, u])
            items = np.concatenate([items, i])
            _, idx = np.unique(users * num_items + items, return_index=True)
            idx.sort()
            users, items = users[idx], items[idx]
        return users[:n], items[:n]

    train_user, train_item = unique_pairs(num_train)
    test_user, test_item = unique_pairs(num_test)
    return Dataset.from_pairs(
        train_user,
        train_item,
        test_user,
        test_item,
        num_users=num_users,
        num_items=num_items,
        name=name,
    )


def make_latent_synthetic_dataset(
    num_users: int,
    num_items: int,
    num_train: int,
    num_test: int,
    rank: int = 16,
    seed: int = 0,
    name: str = "latent-synthetic",
    temperature: float = 0.25,
) -> Dataset:
    """Synthetic dataset with LEARNABLE low-rank structure.

    `make_synthetic_dataset` draws train and test independently, so a
    model can learn nothing beyond item popularity and eval saturates
    at epoch ~1 — fine for throughput benchmarks, useless for
    convergence studies. Here every user's interactions (train AND
    test) are drawn from one latent preference model
    p(i|u) ∝ softmax(x_u·y_i/τ)·pop_i via per-user Gumbel top-k, with
    the top slice split between train and test — so recovering the
    latent factors genuinely improves Recall/NDCG over training
    (used by scripts/quant_parity.py and convergence tests).
    """
    rng = np.random.default_rng(seed)
    xu = rng.normal(size=(num_users, rank)).astype(np.float32) / np.sqrt(rank)
    yi = rng.normal(size=(num_items, rank)).astype(np.float32)
    pop = np.log((1.0 / np.arange(1, num_items + 1)) ** 0.8).astype(np.float32)

    # per-user interaction counts: multinomial over a mild user skew
    user_w = rng.lognormal(0.0, 0.5, num_users)
    user_w /= user_w.sum()
    k_train = rng.multinomial(num_train, user_w)
    k_test = rng.multinomial(num_test, user_w)
    k_total = np.minimum(k_train + k_test, num_items)
    k_train = np.minimum(k_train, k_total)

    tr_u, tr_i, te_u, te_i = [], [], [], []
    chunk = max(1, int(2e8 // (num_items * 4)))  # ~200 MB of logits at a time
    for s in range(0, num_users, chunk):
        e = min(s + chunk, num_users)
        logits = (xu[s:e] @ yi.T) / temperature + pop[None, :]
        u01 = rng.random((e - s, num_items), dtype=np.float32)
        gumbel = -np.log(-np.log(u01 + 1e-12) + 1e-12)
        keys = logits + gumbel
        kmax = int(k_total[s:e].max(initial=0))
        if kmax == 0:
            continue
        top = np.argpartition(-keys, kmax - 1, axis=1)[:, :kmax]
        # order within the top slice by key so the train/test split is
        # itself an exchangeable draw from the same distribution
        row_keys = np.take_along_axis(keys, top, axis=1)
        order = np.argsort(-row_keys, axis=1)
        top = np.take_along_axis(top, order, axis=1)
        for r in range(e - s):
            kt, ka = int(k_train[s + r]), int(k_total[s + r])
            sel = top[r, :ka]
            perm = rng.permutation(ka)  # decorrelate split from key rank
            tr_sel, te_sel = sel[perm[:kt]], sel[perm[kt:]]
            tr_u.append(np.full(tr_sel.size, s + r, np.int64)); tr_i.append(tr_sel)
            te_u.append(np.full(te_sel.size, s + r, np.int64)); te_i.append(te_sel)
    cat = lambda xs: np.concatenate(xs) if xs else np.empty(0, np.int64)
    return Dataset.from_pairs(
        cat(tr_u), cat(tr_i), cat(te_u), cat(te_i),
        num_users=num_users, num_items=num_items, name=name,
    )
