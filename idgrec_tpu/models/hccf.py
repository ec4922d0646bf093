"""HCCF (Xia et al., SIGIR'22): hypergraph contrastive CF.

Parity with reference models/HCCF.py: per layer, a GCN branch
(Â · E_prev) plus a hypergraph branch ``H·(Hᵀ·E_prev)`` with
H = E_table @ hyper_table and dropout on H (HCCF.py:49-74); layer
input is the SUM of both branches; final embedding is the sum over all
layer inputs including layer 0 (HCCF.py:66-68). Losses: BPR +
reg (including hyper tables, HCCF.py:101-103) + λ·Σ_layers
InfoNCE(stop_grad(gnn), hyper) over batch users/items (HCCF.py:105-115).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idgrec_tpu.models.base import RecModel, concat_user_item, xavier_uniform
from idgrec_tpu.models.base import batch_final_embeddings as model_base_batch_final
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.propagate import build_adjacency


def _dropout(rng, x, keep_prob):
    if keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


@register("HCCF")
class HCCF(RecModel):
    loss_names = ("bpr", "reg", "ssl")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.ssl_lambda = config.float("ssl_lambda")
        self.keeprate = config.float("keeprate")
        self.temperature = config.float("temperature")
        self.hyper_size = config.int("hyper_size")
        self.num_layers = config.int("GCN_layer")
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)

    def init_params(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        d, h = self.embedding_size, self.hyper_size
        return {
            "user_emb": xavier_uniform(k1, (self.num_users, d)),
            "item_emb": xavier_uniform(k2, (self.num_items, d)),
            "user_hyper": xavier_uniform(k3, (d, h)),
            "item_hyper": xavier_uniform(k4, (d, h)),
        }

    def aggregate(self, params, rng, training):
        emb0 = concat_user_item(params)
        uu_hyper = params["user_emb"] @ params["user_hyper"]  # [U, h]
        ii_hyper = params["item_emb"] @ params["item_hyper"]  # [I, h]

        embeddings = [emb0]
        gnn_embeddings = []
        hyper_embeddings = []
        for layer in range(self.num_layers):
            prev = embeddings[-1]
            gnn = self.graph.matmul(prev)
            if training and self.keeprate < 1.0:
                rng, k1, k2 = jax.random.split(rng, 3)
                uu = _dropout(k1, uu_hyper, self.keeprate)
                ii = _dropout(k2, ii_hyper, self.keeprate)
            else:
                uu, ii = uu_hyper, ii_hyper
            prev_u, prev_i = prev[: self.num_users], prev[self.num_users :]
            hyper_u = uu @ (uu.T @ prev_u)
            hyper_i = ii @ (ii.T @ prev_i)
            hyper = jnp.concatenate([hyper_u, hyper_i], axis=0)
            gnn_embeddings.append(gnn)
            hyper_embeddings.append(hyper)
            embeddings.append(gnn + hyper)
        final = sum(embeddings)
        return final, gnn_embeddings, hyper_embeddings

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        final, gnn_list, hyper_list = self.aggregate(params, rng, training=True)
        user_all, item_all = final[: self.num_users], final[self.num_users :]

        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)
        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * (losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])
            + losses.reg_loss(params["user_hyper"], params["item_hyper"]))

        ssl = jnp.asarray(0.0, jnp.float32)
        for gnn, hyper in zip(gnn_list, hyper_list):
            g = jax.lax.stop_gradient(gnn)
            ssl = ssl + losses.infonce_loss(
                g[: self.num_users][batch["user"]],
                hyper[: self.num_users][batch["user"]],
                self.temperature,
            )
            ssl = ssl + losses.infonce_loss(
                g[self.num_users :][batch["pos"]],
                hyper[self.num_users :][batch["pos"]],
                self.temperature,
            )
        ssl = self.ssl_lambda * ssl
        return (bpr, reg, ssl), state

    def eval_embeddings(self, params, state, ctx, rng):
        final, _, _ = self.aggregate(params, rng, training=False)
        return final[: self.num_users], final[self.num_users :]
