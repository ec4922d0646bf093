"""Full-catalog top-K evaluation, fully on device.

Reference behavior (utility/utility_train/batch_test.py): batch test
users, score the whole catalog, mask train positives, take top-K, and
compute Recall/Precision/NDCG sums normalized by the number of test
users (batch_test.py:37-93). Differences by design:

* the model representation is computed ONCE per sweep, not once per
  user batch (fixes the reference inefficiency at batch_test.py:59);
* train positives are masked with a large negative value *below any
  possible score* instead of the literal ``-1`` the reference writes
  after sigmoid (batch_test.py:65) — equivalent for sigmoid scores,
  and correct for raw-logit models like CVGA where ``-1`` is unsound;
* the entire sweep (scoring, masking, top-k, metric sums) is one
  jitted `lax.scan`; only the final per-k metric vector returns to the
  host.

Early stopping mirrors general_test (batch_test.py:8-34): best
Recall@topK[0], patience `early_stopping` evaluations.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.config import Config
from idgrec_tpu.data.dataset import Dataset
from idgrec_tpu.models.base import RecModel
from idgrec_tpu.ops.metrics import topk_metric_sums

_MASK_VALUE = -1e9


@dataclass
class EvalPlan:
    """Precomputed, device-resident user batches for one test split."""

    users: jnp.ndarray  # [nb, B] int32
    valid: jnp.ndarray  # [nb, B] bool
    truth: jnp.ndarray  # [nb, B, T] int32, -1 padded
    excl_rows: jnp.ndarray  # [nb, P] int32 local batch row
    excl_cols: jnp.ndarray  # [nb, P] int32 item col (num_items = dropped)
    num_test_users: int


def build_eval_plan(
    data: Dataset, batch_size: int, users: list[int] | None = None
) -> EvalPlan:
    test_users = np.asarray(
        sorted(data.test_dict.keys()) if users is None else users, dtype=np.int64
    )
    n = test_users.size
    if n == 0:
        # fail loud at construction: a 0-user plan would divide metric
        # sums by zero and early-stopping would silently run on NaNs
        raise ValueError(
            "evaluation requires at least one test user "
            "(empty test split or empty users list)"
        )
    nb = max(1, -(-n // batch_size))
    padded = nb * batch_size

    users_pad = np.zeros(padded, dtype=np.int32)
    users_pad[:n] = test_users
    valid = np.zeros(padded, dtype=bool)
    valid[:n] = True

    truth_flat = data.padded_test_truth(users_pad)
    # zero out ground truth of padding rows so sizes are 0 there
    truth_flat[~valid] = -1
    t_width = truth_flat.shape[1]

    # per-batch flat exclusion lists (train positives of batch users),
    # built with one O(nnz-of-batch-users) CSR scatter — the per-user
    # Python loop this replaces cost minutes at ~1M-test-user scale
    degrees = np.diff(data.row_ptr)
    batch_users = users_pad.reshape(nb, batch_size)
    batch_valid = valid.reshape(nb, batch_size)
    deg_pad = degrees[users_pad] * valid  # padded rows contribute 0
    deg_b = deg_pad.reshape(nb, batch_size)
    p_width = max(1, int(deg_b.sum(axis=1).max()))

    excl_rows = np.zeros((nb, p_width), dtype=np.int32)
    excl_cols = np.full((nb, p_width), data.num_items, dtype=np.int32)
    total = int(deg_pad.sum())
    if total:
        # within-batch start slot of each user's run = exclusive cumsum
        start = (np.cumsum(deg_b, axis=1) - deg_b).reshape(-1)
        within = np.arange(total) - np.repeat(
            np.cumsum(deg_pad) - deg_pad, deg_pad
        )
        dst_b = np.repeat(np.arange(padded) // batch_size, deg_pad)
        dst_slot = np.repeat(start, deg_pad) + within
        src = np.repeat(data.row_ptr[users_pad], deg_pad) + within
        excl_rows[dst_b, dst_slot] = np.repeat(
            np.arange(padded) % batch_size, deg_pad
        )
        excl_cols[dst_b, dst_slot] = data.col_idx[src]

    return EvalPlan(
        users=jnp.asarray(batch_users),
        valid=jnp.asarray(batch_valid),
        truth=jnp.asarray(truth_flat.reshape(nb, batch_size, t_width)),
        excl_rows=jnp.asarray(excl_rows),
        excl_cols=jnp.asarray(excl_cols),
        num_test_users=int(n),
    )


class Evaluator:
    """Jitted full-catalog evaluator for one model/dataset pair."""

    def __init__(self, model: RecModel, data: Dataset, config: Config,
                 users: list[int] | None = None, mesh=None, pad_meta=None,
                 consts=None):
        self.model = model
        self.mesh = mesh
        # (params_meta, state_meta) when the engine stores row-padded
        # sharded state (parallel/padding.py); sliced back before the
        # model sees it
        self.pad_meta = pad_meta
        self.data = data
        self.top_ks = tuple(config.int_list("top_K"))
        self.max_k = max(self.top_ks)
        # 'exact' = lax.top_k (reference parity); 'approx' = the TPU
        # approx_max_k custom op at recall_target 0.99 — measured
        # on-chip at yelp scale: Recall/NDCG@20 within 1e-3 of exact,
        # ~1.1× faster sweep at 0.99 (1.62× at the looser 0.95 point;
        # docs/evidence/approx_topk.json)
        self.topk_mode = config.str("eval_topk", "exact")
        batch_size = config.int("test_batch_size")
        self.plan = build_eval_plan(data, batch_size, users=users)
        # consts: pass the trainer's already-placed constants to avoid
        # a second sharded copy of the (multi-GB at real scale)
        # adjacency per chip; when absent, place our own
        if consts is not None:
            self._consts = consts
        else:
            self._consts = model.constants()
            if mesh is not None:
                # place the adjacency row-sharded ONCE so eval sweeps
                # don't redistribute the matrix from a replicated
                # device-0 copy every interval, and no full replica
                # stays resident
                from idgrec_tpu.parallel.mesh import global_put, param_shardings

                self._consts = global_put(
                    self._consts, param_shardings(self._consts, mesh)
                )
        self._sweep = jax.jit(self._sweep_impl)
        self._repr = jax.jit(self._repr_impl)

    def _repr_impl(self, params, state, ctx, rng, consts):
        from idgrec_tpu.parallel.mesh import use_mesh

        if self.pad_meta is not None:
            from idgrec_tpu.parallel import padding

            params = padding.unpad_tree(params, self.pad_meta[0])
            state = padding.unpad_tree(state, self.pad_meta[1])
        with use_mesh(self.mesh), self.model.bound_constants(consts):
            return self.model.eval_embeddings(params, state, ctx, rng)

    def compute_repr(self, params, state, ctx, rng):
        """The model representation used for scoring, computed once per
        sweep. Shareable across Evaluators of the same model (the
        sparsity quartile evaluators reuse one propagation instead of
        re-running it per group)."""
        return self._repr(params, state, ctx, rng, self._consts)

    def _sweep_impl(self, eval_repr, users, valid, truth, excl_rows, excl_cols, consts):
        from idgrec_tpu.parallel.mesh import use_mesh

        with use_mesh(self.mesh), self.model.bound_constants(consts):
            return self._sweep_body(eval_repr, users, valid, truth, excl_rows, excl_cols)

    def _topk_items_sharded(self, ratings: jnp.ndarray) -> jnp.ndarray:
        """Distributed top-k with the item axis kept sharded — the
        shared `parallel.topk.sharded_topk` merge (reference anchor:
        `torch.topk(rating, max(topK))`, batch_test.py:68)."""
        from idgrec_tpu.parallel.topk import sharded_topk

        _, idx = sharded_topk(
            ratings, self.mesh, self.max_k, approx=self.topk_mode == "approx"
        )
        return idx

    @property
    def _items_sharded(self) -> bool:
        from idgrec_tpu.parallel.topk import items_sharded

        return items_sharded(self.mesh)

    def _sweep_body(self, eval_repr, users, valid, truth, excl_rows, excl_cols):
        def one_batch(sums, batch):
            b_users, b_valid, b_truth, b_rows, b_cols = batch
            ratings = self.model.score_batch(eval_repr, b_users)
            ratings = ratings.astype(jnp.float32)
            # mask train positives below any reachable score
            ratings = ratings.at[b_rows, b_cols].set(_MASK_VALUE, mode="drop")
            if self._items_sharded:
                topk_idx = self._topk_items_sharded(ratings)
            elif self.topk_mode == "approx":
                # recall_target 0.99 (not the 0.95 default): measured
                # on-chip at yelp scale it holds Recall/NDCG@20 within
                # 1e-3 of exact at a ~1.1× sweep speedup (0.95 gives
                # 1.62× but looser quality —
                # docs/evidence/approx_topk.json)
                _, topk_idx = jax.lax.approx_max_k(
                    ratings, self.max_k, recall_target=0.99
                )
            else:
                _, topk_idx = jax.lax.top_k(ratings, self.max_k)
            m = topk_metric_sums(topk_idx, b_truth, self.top_ks, valid=b_valid)
            sums = jax.tree.map(lambda a, b: a + b, sums, m)
            return sums, None

        zero = {
            "recall": jnp.zeros(len(self.top_ks), jnp.float32),
            "precision": jnp.zeros(len(self.top_ks), jnp.float32),
            "ndcg": jnp.zeros(len(self.top_ks), jnp.float32),
            "count": jnp.asarray(0.0, jnp.float32),
        }
        sums, _ = jax.lax.scan(
            one_batch, zero, (users, valid, truth, excl_rows, excl_cols)
        )
        return sums

    def evaluate(self, params, state, ctx, rng,
                 eval_repr=None) -> dict[str, np.ndarray]:
        """Full-catalog metrics. Pass ``eval_repr`` (from
        ``compute_repr``) to reuse one representation across several
        evaluators (sparsity quartiles) instead of re-propagating."""
        p = self.plan
        if eval_repr is None:
            eval_repr = self.compute_repr(params, state, ctx, rng)
        sums = self._sweep(
            eval_repr, p.users, p.valid, p.truth, p.excl_rows, p.excl_cols,
            self._consts,
        )
        n = float(p.num_test_users)
        return {
            "recall": np.asarray(sums["recall"]) / n,
            "precision": np.asarray(sums["precision"]) / n,
            "ndcg": np.asarray(sums["ndcg"]) / n,
        }


@dataclass
class BestResults:
    """Early-stopping bookkeeping (batch_test.py:8-34)."""

    patience: int
    count: int = 0
    epoch: int = 0
    recall: np.ndarray | None = None
    ndcg: np.ndarray | None = None
    stop: bool = False

    def update(self, result: dict[str, np.ndarray], epoch: int) -> None:
        if self.recall is None or result["recall"][0] > self.recall[0]:
            self.count = 0
            self.epoch = epoch + 1
            self.recall = result["recall"].copy()
            self.ndcg = result["ndcg"].copy()
        else:
            self.count += 1
            if self.count >= self.patience:
                self.stop = True
