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
from idgrec_tpu.ops.propagate import (
    BitRectAdj,
    BitSquareAdj,
    DenseRectAdj,
    DenseSquareAdj,
    FusedSquareAdj,
    GatherRectAdj,
    GatherSquareAdj,
)

_ADJ_TYPES = (SparseGraph, DenseSquareAdj, DenseRectAdj, GatherSquareAdj,
              GatherRectAdj, BitSquareAdj, BitRectAdj, FusedSquareAdj)

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


def torch_linear_init(rng: jax.Array, fan_in: int, fan_out: int):
    """torch.nn.Linear default init: W, b ~ U(-k, k), k = 1/sqrt(fan_in)
    (kaiming_uniform with a=√5). Returns (W [in, out], b [out]) for the
    y = x @ W + b convention."""
    k = float(1.0 / np.sqrt(fan_in))
    kw, kb = jax.random.split(rng)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-k, maxval=k)
    b = jax.random.uniform(kb, (fan_out,), minval=-k, maxval=k)
    return w, b


def dropout(rng: jax.Array, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    """Inverted dropout (torch semantics: scale kept values by 1/keep)."""
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def batch_norm(x: jnp.ndarray, gamma=None, beta=None, eps: float = 1e-5) -> jnp.ndarray:
    """Batch normalization over axis 0 with batch statistics (torch
    BatchNorm1d in training mode; RecDCL never uses the running stats
    at eval — models/RecDCL.py:146-153)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.var(x, axis=0, keepdims=True)
    y = (x - mean) / jnp.sqrt(var + eps)
    if gamma is not None:
        y = y * gamma[None, :] + beta[None, :]
    return y


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
        self.backend = config.str("propagation_backend", "auto")
        self.compute_dtype = config.str("compute_dtype", "bfloat16")

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
            if isinstance(value, _ADJ_TYPES):
                setattr(self, attr, jax.device_put(value))
        return self

    def constants(self) -> dict[str, Any]:
        """The model's large non-trainable device arrays (graphs, SVD
        factors, padded CSR tables). The engine passes these THROUGH
        the jit boundary as arguments: if they were left as Python
        closures, jit would embed them as compile-time constants —
        gigabytes in the program payload (fatal with remote
        compilation, wasteful everywhere)."""
        out: dict[str, Any] = {}
        for attr, value in self.__dict__.items():
            if isinstance(value, _ADJ_TYPES) or isinstance(value, jnp.ndarray):
                out[attr] = value
        return out

    from contextlib import contextmanager as _contextmanager

    @_contextmanager
    def bound_constants(self, consts: dict[str, Any]):
        """Temporarily rebind constant attributes to (traced) values
        while a jitted function body traces through model methods."""
        originals = {k: getattr(self, k) for k in consts}
        try:
            for k, v in consts.items():
                setattr(self, k, v)
            yield self
        finally:
            for k, v in originals.items():
                setattr(self, k, v)


# ---------------------------------------------------------------------------
# Shared propagation rules


def concat_user_item(params: Params) -> jnp.ndarray:
    return jnp.concatenate([params["user_emb"], params["item_emb"]], axis=0)


def split_user_item(emb: jnp.ndarray, num_users: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    return emb[:num_users], emb[num_users:]


def lightgcn_propagate(
    graph,
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
    if num_layers == 0 and not include_layer0:
        raise ValueError(
            "num_layers=0 with include_layer0=False leaves no embeddings "
            "to combine (GCN_layer must be >= 1 for this model)"
        )
    from idgrec_tpu.ops import chainmm as _chainmm
    from idgrec_tpu.ops import propagate as _prop

    if _chainmm.supports_chain_resident(graph, emb0.shape[1], num_layers,
                                        reduce, None):
        # quantized fused backend, reduce-mode chain: ONE Pallas launch
        # for the whole K-layer chain with VMEM-resident activations,
        # scales, and combine (ops/chainmm.py) — per-sweep HBM traffic
        # is the adjacency read alone; bit-identical results
        return _chainmm.fused_chain_resident(graph, emb0, num_layers,
                                             include_layer0, reduce)
    if num_layers > 0 and _prop.supports_chain_t(graph, emb0.shape[1]):
        # quantized fused backend: run the whole chain in transposed
        # [d, N] layout (N-wide MXU dots, ~1.6x faster per application
        # — ops/propagate.fused_chain_t); bit-identical results
        return _prop.fused_chain_t(graph, emb0, num_layers,
                                   include_layer0, reduce)
    layers = []
    if include_layer0:
        layers.append(emb0)
    h = emb0
    for _ in range(num_layers):
        h = graph.matmul(h)
        layers.append(h)
    stacked = jnp.stack(layers, axis=0)
    if reduce == "mean":
        return jnp.mean(stacked, axis=0)
    if reduce == "sum":
        return jnp.sum(stacked, axis=0)
    raise ValueError(f"unknown reduce {reduce!r}")


def lightgcn_propagate_rows(
    graph,
    emb0: jnp.ndarray,
    num_layers: int,
    rows_u: jnp.ndarray,
    rows_i: jnp.ndarray,
    num_users: int,
    include_layer0: bool = True,
    reduce: str = "mean",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """`lightgcn_propagate` restricted to selected output rows — exact
    same math, but the LAST layer runs as a batch-row partial matmul
    (graph.matmul_rows), so one full fwd application and (through
    autodiff) one full bwd application per step are replaced by
    O(B·N·d) partials. Returns (user_rows_final, item_rows_final).

    Requires graph.supports_rows (dense backend with a stored
    transpose); callers fall back to full propagation otherwise.
    """
    if num_layers == 0:
        full = lightgcn_propagate(graph, emb0, 0, include_layer0, reduce)
        return full[rows_u], full[num_users + rows_i]
    layers_u = []
    layers_i = []
    h = emb0
    if include_layer0:
        layers_u.append(h[rows_u])
        layers_i.append(h[num_users + rows_i])
    for _ in range(num_layers - 1):
        h = graph.matmul(h)
        layers_u.append(h[rows_u])
        layers_i.append(h[num_users + rows_i])
    yu, yi = graph.matmul_rows(h, rows_u, rows_i)
    layers_u.append(yu)
    layers_i.append(yi)
    su = jnp.stack(layers_u, axis=0)
    si = jnp.stack(layers_i, axis=0)
    if reduce == "mean":
        return jnp.mean(su, axis=0), jnp.mean(si, axis=0)
    if reduce == "sum":
        return jnp.sum(su, axis=0), jnp.sum(si, axis=0)
    raise ValueError(f"unknown reduce {reduce!r}")


def lightgcn_layer_outputs(
    graph, emb0: jnp.ndarray, num_layers: int
) -> list[jnp.ndarray]:
    """[emb0, Â·emb0, Â²·emb0, ...] — the per-layer list some SSL models
    contrast across (models/NCL.py:48-64, models/CGCL.py:44-60)."""
    from idgrec_tpu.ops import propagate as _prop

    if num_layers > 0 and _prop.supports_chain_t(graph, emb0.shape[1]):
        return _prop.fused_chain_t(graph, emb0, num_layers,
                                   include_layer0=True, reduce=None)
    outs = [emb0]
    h = emb0
    for _ in range(num_layers):
        h = graph.matmul(h)
        outs.append(h)
    return outs


def batch_final_embeddings(user_all, item_all, batch,
                           compute_dtype="bfloat16"):
    """(user_all[u], item_all[pos], item_all[neg]) with the backward's
    batch-cotangent row scatters on the Pallas scatter kernel when the
    tables fit its VMEM residency budget (ops/scatter.py — measured
    ~4.8x XLA's row scatter-add on v5e); plain indexing otherwise."""
    from idgrec_tpu.ops import scatter as _scatter

    if _scatter.supports_fast_scatter(
            user_all.shape[0] + item_all.shape[0], user_all.shape[1],
            compute_dtype):
        return _scatter.gather_batch_embeddings(
            user_all, item_all, batch["user"], batch["pos"], batch["neg"])
    return (user_all[batch["user"]], item_all[batch["pos"]],
            item_all[batch["neg"]])


def batch_user_pos_embeddings(user_all, item_all, batch,
                              compute_dtype="bfloat16"):
    """2-gather twin of batch_final_embeddings (align/uniform models)."""
    from idgrec_tpu.ops import scatter as _scatter

    if _scatter.supports_fast_scatter(
            user_all.shape[0] + item_all.shape[0], user_all.shape[1],
            compute_dtype):
        return _scatter.gather_user_pos(user_all, item_all,
                                        batch["user"], batch["pos"])
    return user_all[batch["user"]], item_all[batch["pos"]]
