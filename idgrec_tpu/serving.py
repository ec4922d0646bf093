"""Batch inference / serving API.

The reference has no serving path (SURVEY §1: "no serving path");
this module is the deployment-side counterpart of the evaluator: a
`Recommender` wraps trained parameters and answers top-K requests as
one jitted program per batch shape.

Design (TPU-serving-first):

* the model representation (`eval_embeddings`) is computed ONCE at
  construction and kept on device — requests only pay a [B, d] gather,
  a [B, num_items] MXU matmul and a top-k;
* seen-item filtering uses the same padded exclusion lists as the
  evaluator (reference semantics: train positives are never
  recommended, batch_test.py:62-65);
* arbitrary request sizes are padded to the next power of two so at
  most log2(max_batch) programs ever compile.

Works with any registered model. Example:

    rec = Recommender.from_train_result("LightGCN", data, cfg, result)
    items, scores = rec.recommend([1, 17, 42], k=10)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.config import Config
from idgrec_tpu.data.dataset import Dataset
from idgrec_tpu.models import get_model

_MASK_VALUE = -1e9


class Recommender:
    """Device-resident top-K recommendation server for one model."""

    def __init__(self, model, params, state, ctx, data: Dataset,
                 filter_seen: bool = True, rng: jax.Array | None = None,
                 topk_mode: str = "exact", mesh=None):
        self.model = model
        self.data = data
        self.filter_seen = filter_seen
        # 'approx' = TPU approx_max_k (measured round 5: 1.08x faster
        # full-catalog sweep at the shipped 0.99 recall target with
        # metric deltas < 1e-3 — docs/evidence/approx_topk.json; the
        # scoring matmul now dominates the sweep, so approx ranking
        # buys little at this catalog size)
        self.topk_mode = topk_mode
        # mesh: serve with the item axis sharded over 'model' — the
        # [B, num_items] score matrix is column-sharded and ranking
        # runs as local top-k + a tiny candidate merge
        # (parallel/topk.sharded_topk), so giant catalogs never
        # materialize replicated scores
        self.mesh = mesh
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        # constants (the normalized adjacency — 100s of MB at scale)
        # are jit ARGUMENTS, not closure captures: captured device
        # arrays are embedded in the compiled program as literals,
        # bloating the executable (and overflowing the axon tunnel's
        # remote-compile request outright — measured, HTTP 413)

        def _embed(p, s, c, r, consts):
            with model.bound_constants(consts):
                return model.eval_embeddings(p, s, c, r)

        self._repr = jax.jit(_embed)(params, state, ctx, rng,
                                     model.constants())
        jax.block_until_ready(self._repr)
        # Padded per-user positives for masking (int32 [U, P], pad col
        # num_items — dropped by scatter mode="drop"). Built with one
        # vectorized CSR->padded scatter (O(nnz), <1s at amazon-book
        # scale) and kept on HOST: requests gather only their [B, P]
        # rows, so the multi-GB full matrix never occupies device HBM.
        deg = np.diff(data.row_ptr)
        p = max(int(deg.max()) if deg.size else 1, 1)
        excl = np.full((data.num_users, p), data.num_items, np.int32)
        if data.nnz:
            rows = np.repeat(np.arange(data.num_users), deg)
            slots = np.arange(data.nnz) - np.repeat(data.row_ptr[:-1], deg)
            excl[rows, slots] = data.col_idx
        self._excl = excl
        # _repr is likewise an argument (it is device-resident state,
        # not program code)
        self._score = jax.jit(self._score_impl, static_argnums=(3,))

    @classmethod
    def from_train_result(cls, model_name: str, data: Dataset, config: Config,
                          result, **kw) -> "Recommender":
        model = get_model(model_name)(config, data)
        model.device_put()
        return cls(model, result.params, result.state, (), data, **kw)

    @classmethod
    def from_checkpoint(cls, model_name: str, data: Dataset, config: Config,
                        checkpoint_dir: str, epoch: int | None = None,
                        **kw) -> "Recommender":
        """Serve from a training checkpoint written by
        ``train_model(checkpoint_dir=...)`` — the deploy path: train in
        one process, recommend from the saved weights in another. Loads
        the latest checkpoint unless ``epoch`` picks a specific one."""
        from idgrec_tpu.engine import checkpoint as ckpt
        from idgrec_tpu.engine.trainer import EpochRunner

        model = get_model(model_name)(config, data)
        model.device_put()
        rng = jax.random.PRNGKey(0)
        params = model.init_params(rng)
        state = model.init_state(rng)
        # the checkpoint tree is {params, opt_state, state, rng}
        # (engine/loop.py); rebuild the same template shapes
        runner = EpochRunner(
            model, learn_rate=config.float("learn_rate"),
            batch_size=config.int("batch_size"), num_train=data.num_train,
        )
        template = {
            "params": params, "opt_state": runner.init_opt_state(params),
            "state": state, "rng": rng,
        }
        if epoch is None:
            epoch = ckpt.latest_checkpoint(checkpoint_dir)
            if epoch is None:
                raise FileNotFoundError(
                    f"no checkpoints under {checkpoint_dir!r}")
        tree, _meta = ckpt.load_checkpoint(checkpoint_dir, epoch, template)
        return cls(model, tree["params"], tree["state"], (), data, **kw)

    def _score_impl(self, repr_, users: jnp.ndarray, excl_rows: jnp.ndarray,
                    k: int):
        from idgrec_tpu.parallel.topk import items_sharded, sharded_topk

        ratings = self.model.score_batch(repr_, users).astype(jnp.float32)
        if self.filter_seen:
            b = users.shape[0]
            row_ids = jnp.repeat(jnp.arange(b), excl_rows.shape[1])
            ratings = ratings.at[row_ids, excl_rows.reshape(-1)].set(
                _MASK_VALUE, mode="drop"
            )
        if items_sharded(self.mesh):
            return sharded_topk(
                ratings, self.mesh, k, approx=self.topk_mode == "approx"
            )
        if self.topk_mode == "approx":
            return jax.lax.approx_max_k(ratings, k)
        return jax.lax.top_k(ratings, k)

    def recommend(self, users, k: int = 10):
        """Top-k unseen items for each user id. Returns (items [B, k]
        int64, scores [B, k] float32) as numpy arrays."""
        users = np.asarray(users, np.int32)
        if users.ndim != 1:
            raise ValueError("users must be a 1-D list of user ids")
        if np.any((users < 0) | (users >= self.data.num_users)):
            raise ValueError("user id out of range")
        if not 0 < k <= self.data.num_items:
            raise ValueError(
                f"k must be in [1, num_items={self.data.num_items}], got {k}")
        b = users.size
        b_pad = 1 << max(0, (b - 1).bit_length())
        users_pad = np.zeros(b_pad, np.int32)
        users_pad[:b] = users
        excl = jnp.asarray(self._excl[users_pad])
        scores, items = self._score(self._repr, jnp.asarray(users_pad), excl,
                                    int(k))
        return np.asarray(items[:b], np.int64), np.asarray(scores[:b])
