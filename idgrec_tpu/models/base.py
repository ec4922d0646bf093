"""Model base contract and shared propagation helpers.

The portable contract from the reference (SURVEY.md §1): a model is

* a set of loss terms over a sampled (user, pos, neg) batch — the
  reference's ``forward(user, pos, neg) -> loss_list``
  (e.g. models/LightGCN.py:54-72), and
* a full-catalog scorer — ``get_rating_for_test(user) -> [B, num_items]``
  (models/LightGCN.py:74-80).

Here both are pure functions over explicit parameter/state pytrees so
they can be jitted, scanned over a whole epoch, differentiated, and
sharded with pjit. The evaluator computes `eval_embeddings` once per
sweep and scores user batches against it (fixing the reference's
re-aggregation per eval batch, batch_test.py:59 — SURVEY §7.3.7).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.config import Config
from idgrec_tpu.data.dataset import Dataset
from idgrec_tpu.data.graph import SparseGraph
from idgrec_tpu.ops.spmm import spmm

Params = Any
State = Any
Context = Any


def xavier_uniform(rng: jax.Array, shape: tuple[int, ...], dtype=jnp.float32) -> jnp.ndarray:
    """Xavier/Glorot uniform with gain 1, matching
    ``torch.nn.init.xavier_uniform_`` fan computation on a 2-D tensor
    (fan_out = rows, fan_in = cols; models/MFBPR.py:24-25)."""
    fan_out, fan_in = shape[0], shape[1] if len(shape) > 1 else 1
    limit = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return jax.random.uniform(rng, shape, dtype=dtype, minval=-limit, maxval=limit)


class RecModel:
    """Base class: embedding-table recommender over a fixed graph.

    Subclasses override `init_params`, `loss_terms`, and usually
    `propagate`. All heavy arrays (graphs) are built in ``__init__``
    (host/numpy) and must be moved on-device once via
    ``jax.device_put`` by the engine.
    """

    model_name: str = "RecModel"
    loss_names: Sequence[str] = ("loss",)

    def __init__(self, config: Config, data: Dataset):
        self.config = config
        self.data = data
        self.num_users = data.num_users
        self.num_items = data.num_items
        self.embedding_size = config.int("embedding_size")

    # -- parameters / state -------------------------------------------------
    def init_params(self, rng: jax.Array) -> Params:
        u_rng, i_rng = jax.random.split(rng)
        return {
            "user_emb": xavier_uniform(u_rng, (self.num_users, self.embedding_size)),
            "item_emb": xavier_uniform(i_rng, (self.num_items, self.embedding_size)),
        }

    def init_state(self, rng: jax.Array) -> State:
        return {}

    def epoch_context(self, params: Params, state: State, epoch: int, np_rng: np.random.Generator) -> Context:
        """Per-epoch host-side setup (e.g. SGL's augmented graphs,
        reference models/SGL.py:126-143). Returned pytree is passed to
        `loss_terms`/`eval_embeddings`. Must keep stable pytree
        structure and array shapes across epochs (one jit trace)."""
        return ()

    # -- training -----------------------------------------------------------
    def loss_terms(
        self,
        params: Params,
        state: State,
        ctx: Context,
        batch: dict[str, jnp.ndarray],
        rng: jax.Array,
        epoch: jnp.ndarray,
    ) -> tuple[tuple[jnp.ndarray, ...], State]:
        """Returns (per-term losses, new state). Fixed arity/structure."""
        raise NotImplementedError

    # -- evaluation ---------------------------------------------------------
    def eval_embeddings(
        self, params: Params, state: State, ctx: Context, rng: jax.Array
    ) -> Any:
        """Representation used for full-catalog scoring, computed ONCE
        per evaluation sweep (the reference re-aggregates per batch,
        batch_test.py:59). Default contract: (user_emb, item_emb)."""
        raise NotImplementedError

    def score_batch(self, eval_repr: Any, users: jnp.ndarray) -> jnp.ndarray:
        """[B, num_items] preference scores for a user batch, given
        `eval_embeddings` output. Default sigmoid(U @ Iᵀ)
        (models/MFBPR.py:44-49); sigmoid is monotonic so ranking is
        unchanged — kept for score-value parity."""
        user_emb, item_emb = eval_repr
        # full f32 precision: the TPU MXU otherwise truncates to bf16,
        # which can reorder near-tied items in the top-K cut
        logits = jnp.matmul(user_emb[users], item_emb.T, precision=jax.lax.Precision.HIGHEST)
        return jax.nn.sigmoid(logits)

    # -- misc ---------------------------------------------------------------
    def device_put(self):
        """Move the model's constant arrays (graphs) on-device once."""
        for attr, value in list(self.__dict__.items()):
            if isinstance(value, SparseGraph):
                setattr(self, attr, jax.device_put(value))
        return self


# ---------------------------------------------------------------------------
# Shared propagation rules


def concat_user_item(params: Params) -> jnp.ndarray:
    return jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)


def split_user_item(emb: jnp.ndarray, num_users: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    return emb[:num_users], emb[num_users:]


def lightgcn_propagate(
    graph: SparseGraph,
    emb0: jnp.ndarray,
    num_layers: int,
    include_layer0: bool = True,
    reduce: str = "mean",
) -> jnp.ndarray:
    """K-layer linear propagation with layer combination.

    reduce='mean' + include_layer0 is canonical LightGCN
    (models/LightGCN.py:36-52); SimGCL drops layer 0
    (models/SimGCL.py:44-53); BIGCF/MixRec/EGCF use reduce='sum'.
    """
    layers = []
    if include_layer0:
        layers.append(emb0)
    h = emb0
    for _ in range(num_layers):
        h = spmm(graph, h)
        layers.append(h)
    stacked = jnp.stack(layers, axis=0)
    if reduce == "mean":
        return jnp.mean(stacked, axis=0)
    if reduce == "sum":
        return jnp.sum(stacked, axis=0)
    raise ValueError(f"unknown reduce {reduce!r}")


def lightgcn_layer_outputs(
    graph: SparseGraph, emb0: jnp.ndarray, num_layers: int
) -> list[jnp.ndarray]:
    """[emb0, Â·emb0, Â²·emb0, ...] — the per-layer list some SSL models
    contrast across (models/NCL.py:48-64, models/CGCL.py:44-60)."""
    outs = [emb0]
    h = emb0
    for _ in range(num_layers):
        h = spmm(graph, h)
        outs.append(h)
    return outs
