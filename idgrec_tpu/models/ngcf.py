"""NGCF (Wang et al., SIGIR'19): neural graph collaborative filtering.

Parity with reference models/NGCF.py: self-loop normalized adjacency
(NGCF.py:49); per layer — side = Â_self·ego, sum term
(side·W₁ + b₁), bi-interaction term ((ego ⊙ side)·W₂ + b₂),
LeakyReLU(0.2), message dropout, L2 row-normalize; layer outputs are
CONCATENATED (NGCF.py:67-111); the next layer consumes the dropped-out
(un-normalized) activations. Losses: BPR + λ·reg over the ego ITEM
embeddings only (NGCF.py:120-126 — users excluded, a reference quirk
kept).

Known reference deviations (not copied):
* the reference's inline ``nn.Dropout(...)`` modules are created per
  call and never see ``.eval()``, so the reference evaluates WITH
  active dropout; here dropout is training-only (standard semantics);
* node (edge-value) dropout is configured off and would crash the
  reference with a KeyError (NGCF.py:76 reads ``node_keep_prob`` which
  no config defines); here it reads ``node_drop_prob``, works on the
  gather backend, and forces that backend when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idgrec_tpu.models.base import (
    batch_final_embeddings as model_base_batch_final,
    RecModel,
    concat_user_item,
    dropout,
    split_user_item,
    xavier_uniform,
)
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.losses import _normalize
from idgrec_tpu.ops.propagate import build_adjacency


class _WeightedGCNBase(RecModel):
    """Shared machinery for the NGCF/GCMC/GCCF family: per-layer weight
    matrices, message dropout, concatenated layer outputs."""

    adjacency_variant = "self"
    weight_names: tuple[str, ...] = ()

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.num_layers = config.int("GCN_layer")
        self.layer_sizes = [self.embedding_size] + config.int_list("layer_size")
        self.mess_dropout = (
            config.float_list("mess_drop_prob")
            if config.bool("mess_dropout", False)
            else [0.0] * self.num_layers
        )
        self.node_dropout = config.bool("node_dropout", False)
        self.node_drop_prob = config.float("node_drop_prob", 0.0)
        backend = "gather" if self.node_dropout else self.backend
        self.graph = build_adjacency(
            data, self.adjacency_variant, backend,
            compute_dtype=self.compute_dtype, emb_size=self.embedding_size,
        )

    def init_params(self, rng):
        keys = jax.random.split(rng, 2 + 2 * self.num_layers * len(self.weight_names))
        params = {
            "user_emb": xavier_uniform(keys[0], (self.num_users, self.embedding_size)),
            "item_emb": xavier_uniform(keys[1], (self.num_items, self.embedding_size)),
        }
        idx = 2
        for layer in range(self.num_layers):
            d_in, d_out = self.layer_sizes[layer], self.layer_sizes[layer + 1]
            for name in self.weight_names:
                params[f"W_{name}_{layer}"] = xavier_uniform(keys[idx], (d_in, d_out))
                params[f"b_{name}_{layer}"] = xavier_uniform(keys[idx + 1], (1, d_out))
                idx += 2
        return params

    def _propagated_graph_matmul(self, h, rng, training):
        """One Â·h with optional training-time edge-value dropout
        (reference node_dropout, NGCF.py:56-65)."""
        if training and self.node_dropout and self.node_drop_prob > 0.0:
            from idgrec_tpu.data.graph import SparseGraph

            g = self.graph.graph  # gather backend enforced in __init__
            keep = 1.0 - self.node_drop_prob
            mask = jax.random.bernoulli(rng, keep, g.vals.shape)
            vals = jnp.where(mask, g.vals / keep, 0.0)
            dropped = SparseGraph(
                rows=g.rows, cols=g.cols, vals=vals,
                t_rows=g.t_rows, t_cols=g.t_cols,
                t_vals=vals if g.symmetric else g.t_vals,
                n_rows=g.n_rows, n_cols=g.n_cols, nnz=g.nnz, symmetric=g.symmetric,
            )
            from idgrec_tpu.ops.spmm import spmm

            return spmm(dropped, h)
        return self.graph.matmul(h)

    def layer_transform(self, params, layer, ego, side, rng, training):
        raise NotImplementedError

    def aggregate(self, params, rng, training):
        ego = concat_user_item(params)
        outputs = [ego]
        for layer in range(self.num_layers):
            rng, k_graph, k_layer = jax.random.split(rng, 3)
            side = self._propagated_graph_matmul(ego, k_graph, training)
            ego, out = self.layer_transform(params, layer, ego, side, k_layer, training)
            outputs.append(out)
        final = jnp.concatenate(outputs, axis=1)
        return split_user_item(final, self.num_users)

    def eval_embeddings(self, params, state, ctx, rng):
        return self.aggregate(params, rng, training=False)


@register("NGCF")
class NGCF(_WeightedGCNBase):
    loss_names = ("bpr", "reg")
    adjacency_variant = "self"
    weight_names = ("gcn", "bi")

    def layer_transform(self, params, layer, ego, side, rng, training):
        sum_emb = side @ params[f"W_gcn_{layer}"] + params[f"b_gcn_{layer}"]
        bi_emb = (ego * side) @ params[f"W_bi_{layer}"] + params[f"b_bi_{layer}"]
        h = jax.nn.leaky_relu(sum_emb + bi_emb, negative_slope=0.2)
        if training:
            h = dropout(rng, h, self.mess_dropout[layer])
        return h, _normalize(h, axis=1)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.aggregate(params, rng, training=True)
        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)
        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_counted(
            params["item_emb"], batch["pos"], batch["neg"])
        return (bpr, reg), state


@register("GCMC")
class GCMC(_WeightedGCNBase):
    """GCMC per reference models/GCMC.py: per layer — GCN transform with
    LeakyReLU then an MLP transform, message dropout, L2-normalize,
    CONCAT (GCMC.py:66-95); symmetric adjacency WITHOUT self loops
    (GCMC.py:48); reg over ego user+pos+neg (GCMC.py:105-112)."""

    loss_names = ("bpr", "reg")
    adjacency_variant = "sym"
    weight_names = ("gcn", "mlp")

    def layer_transform(self, params, layer, ego, side, rng, training):
        gcn = side @ params[f"W_gcn_{layer}"] + params[f"b_gcn_{layer}"]
        gcn = jax.nn.leaky_relu(gcn, negative_slope=0.2)
        mlp = gcn @ params[f"W_mlp_{layer}"] + params[f"b_mlp_{layer}"]
        if training:
            mlp = dropout(rng, mlp, self.mess_dropout[layer])
        return mlp, _normalize(mlp, axis=1)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.aggregate(params, rng, training=True)
        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)
        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])
        return (bpr, reg), state


@register("GCCF")
class GCCF(_WeightedGCNBase):
    """LR-GCCF per reference models/GCCF.py: linear residual layers —
    side = Â_self·ego, ego = side·W + b, message dropout, append the
    (un-normalized) activations, CONCAT (GCCF.py:60-91); reg over ego
    item embeddings only (GCCF.py:100-106)."""

    loss_names = ("bpr", "reg")
    adjacency_variant = "self"
    weight_names = ("gcn",)

    def layer_transform(self, params, layer, ego, side, rng, training):
        h = side @ params[f"W_gcn_{layer}"] + params[f"b_gcn_{layer}"]
        if training:
            h = dropout(rng, h, self.mess_dropout[layer])
        return h, h

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.aggregate(params, rng, training=True)
        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)
        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_counted(
            params["item_emb"], batch["pos"], batch["neg"])
        return (bpr, reg), state
