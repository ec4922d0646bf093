"""BIGCF (Zhang et al., SIGIR'24): individual/collective intent CF.

Parity with reference models/BIGCF.py: LightGCN SUM aggregation without
layer 0 (BIGCF.py:46-60); intent projection
``softmax(E @ W_int) @ W_intᵀ`` (BIGCF.py:62-65); final embedding =
gnn + intent ⊙ gaussian noise (BIGCF.py:67-69). Losses: BPR +
reg (incl. intent tables) + λ·(5 InfoNCE terms: self-CL on users,
items, inter user↔item, intent self-CL on users and items,
BIGCF.py:87-102). The reference ships no configure/BIGCF.txt
(SURVEY §2.1) — ours provides the missing keys.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idgrec_tpu.models.base import (
    batch_final_embeddings as model_base_batch_final,
    RecModel,
    concat_user_item,
    lightgcn_propagate,
    split_user_item,
    xavier_uniform,
)
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.propagate import build_adjacency


@register("BIGCF")
class BIGCF(RecModel):
    loss_names = ("bpr", "reg", "ssl")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.ssl_lambda = config.float("ssl_lambda")
        self.ssl_temperature = config.float("ssl_temperature")
        self.int_temperature = config.float("int_temperature")
        self.intent_size = config.int("intent_size")
        self.num_layers = config.int("GCN_layer")
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)

    def init_params(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        d = self.embedding_size
        return {
            "user_emb": xavier_uniform(k1, (self.num_users, d)),
            "item_emb": xavier_uniform(k2, (self.num_items, d)),
            "user_intent": xavier_uniform(k3, (d, self.intent_size)),
            "item_intent": xavier_uniform(k4, (d, self.intent_size)),
        }

    def aggregate(self, params, rng):
        emb0 = concat_user_item(params)
        gnn = lightgcn_propagate(
            self.graph, emb0, self.num_layers, include_layer0=False, reduce="sum"
        )
        gnn_u, gnn_i = split_user_item(gnn, self.num_users)
        user_intent = jax.nn.softmax(gnn_u @ params["user_intent"], axis=1) @ params["user_intent"].T
        item_intent = jax.nn.softmax(gnn_i @ params["item_intent"], axis=1) @ params["item_intent"].T
        intent = jnp.concatenate([user_intent, item_intent], axis=0)
        noise = jax.random.normal(rng, gnn.shape, dtype=jnp.float32).astype(gnn.dtype)
        final = gnn + intent * noise
        users, items = split_user_item(final, self.num_users)
        return users, items, user_intent, item_intent

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all, intent_u, intent_i = self.aggregate(params, rng)

        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)
        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * (losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])
            + losses.reg_loss(params["user_intent"], params["item_intent"]))

        t = self.ssl_temperature
        ssl = (
            losses.infonce_loss(user_e, user_e, t)
            + losses.infonce_loss(pos_e, pos_e, t)
            + losses.infonce_loss(user_e, pos_e, t)
            + losses.infonce_loss(intent_u[batch["user"]], intent_u[batch["user"]], t)
            + losses.infonce_loss(intent_i[batch["pos"]], intent_i[batch["pos"]], t)
        )
        ssl = self.ssl_lambda * ssl
        return (bpr, reg, ssl), state

    def eval_embeddings(self, params, state, ctx, rng):
        user_all, item_all, _, _ = self.aggregate(params, rng)
        return user_all, item_all
