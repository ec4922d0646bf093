"""IMP-GCN (Liu et al., WWW'21): interest-aware message passing.

Parity with reference models/IMPGCN.py: a user-grouping subnetwork
(fc → LeakyReLU → dropout → fc_group → dropout → top-1 one-hot,
IMPGCN.py:50-64 — items always belong to every group, IMPGCN.py:63);
per-group subgraphs gate edges on BOTH endpoints (IMPGCN.py:44-48,
66-70); layer 0 is shared per group, deeper layers propagate group-wise
and are SUMMED per layer (which multiplies layer 0 by num_groups — a
reference quirk kept, IMPGCN.py:72-81), then MEAN over layers.

Note on gradients: the one-hot grouping comes from ``torch.eq`` in the
reference — non-differentiable — so the fc/fc_group parameters receive
no gradient there either; the gates here are wrapped in stop_gradient
to make that explicit.
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
    torch_linear_init,
    xavier_uniform,
)
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.propagate import build_adjacency


@register("IMPGCN")
class IMPGCN(RecModel):
    loss_names = ("bpr", "reg")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.num_groups = config.int("group")
        self.num_layers = config.int("GCN_layer")
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)

    def init_params(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        d = self.embedding_size
        fc_w, fc_b = torch_linear_init(k3, d, d)
        fg_w, fg_b = torch_linear_init(k4, d, self.num_groups)
        return {
            "user_emb": xavier_uniform(k1, (self.num_users, d)),
            "item_emb": xavier_uniform(k2, (self.num_items, d)),
            "fc_w": fc_w, "fc_b": fc_b,
            "fc_group_w": fg_w, "fc_group_b": fg_b,
        }

    def _group_gates(self, params, ego, side, rng, training):
        """[num_groups, U+I] 0/1 gates (IMPGCN.py:50-64)."""
        h = jax.nn.leaky_relu((ego + side) @ params["fc_w"] + params["fc_b"])
        if training:
            rng, k = jax.random.split(rng)
            h = dropout(k, h, 0.4)
        scores = h @ params["fc_group_w"] + params["fc_group_b"]
        if training:
            rng, k = jax.random.split(rng)
            scores = dropout(k, scores, 0.4)
        top = jnp.max(scores, axis=1, keepdims=True)
        one_hot = (scores == top).astype(jnp.float32)  # ties -> multiple groups
        user_groups, item_groups = split_user_item(one_hot, self.num_users)
        item_groups = jnp.ones_like(item_groups)  # items in every group
        gates = jnp.concatenate([user_groups, item_groups], axis=0).T
        return jax.lax.stop_gradient(gates)

    def aggregate(self, params, rng, training):
        ego = concat_user_item(params)
        rng, k_side, k_gate = jax.random.split(rng, 3)
        side = self.graph.matmul(ego)
        gates = self._group_gates(params, ego, side, k_gate, training)

        # The G per-group chains are independent over the SAME
        # adjacency, so they run as ONE feature-batched propagation:
        # each layer reads the interaction matrix once for all groups
        # (G× less of the HBM traffic the step is bound by) at d·G MXU
        # width. The per-group gated operator is g⊙(Â(g⊙x)) with
        # BINARY gates (g² = g), so pre/post scaling the batched
        # columns reproduces the reference's per-group subgraph SpMM
        # chain exactly (IMPGCN.py:66-81). Layer 0 is shared per group
        # (sum over identical copies = G·ego, IMPGCN.py:72-81 quirk).
        G, d = self.num_groups, ego.shape[1]
        gate_cols = jnp.repeat(gates.T, d, axis=1)  # [N, G*d], group-major
        h = jnp.tile(ego, (1, G))
        layer_sums = [self.num_groups * ego]
        for _ in range(1, self.num_layers):
            h = self.graph.matmul(h * gate_cols) * gate_cols
            layer_sums.append(
                sum(h[:, g * d : (g + 1) * d] for g in range(G))
            )
        final = jnp.mean(jnp.stack(layer_sums, axis=0), axis=0)
        return split_user_item(final, self.num_users)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.aggregate(params, rng, training=True)
        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)
        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])
        return (bpr, reg), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.aggregate(params, rng, training=False)
