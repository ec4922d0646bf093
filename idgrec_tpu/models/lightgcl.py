"""LightGCL (Cai et al., ICLR'23): SVD-guided graph contrastive learning.

Parity with reference models/LightGCL.py: two-branch bipartite
propagation over R̃ — per layer ``z_u = R̃·E_i``, ``z_i = R̃ᵀ·E_u``
(LightGCL.py:71-84) with a parallel low-rank branch
``g_u = (U·S)·(Vᵀ·E_i)`` from a rank-q SVD of R̃ computed once at init
(LightGCL.py:38-47); both branches SUM over layers including layer 0.
Losses: BPR + reg + λ·(full-table InfoNCE between the G branch and the
main branch with the reference's ±5 clamp on positive scores,
LightGCL.py:114-120).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idgrec_tpu.models.base import RecModel
from idgrec_tpu.models.base import batch_final_embeddings as model_base_batch_final
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.losses import _matmul
from idgrec_tpu.ops.propagate import build_rect_adjacency
from idgrec_tpu.ops.svd import lowrank_svd


@register("LightGCL")
class LightGCL(RecModel):
    loss_names = ("bpr", "reg", "ssl")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.ssl_lambda = config.float("ssl_lambda")
        self.temperature = config.float("temperature")
        self.num_layers = config.int("GCN_layer")
        self.svd_q = config.int("svd_q")
        self.graph = build_rect_adjacency(data, self.backend, compute_dtype=self.compute_dtype)

        from idgrec_tpu.data.graph import normalized_rectangular

        R = normalized_rectangular(data).to_scipy()
        u, s, v = lowrank_svd(R, self.svd_q, seed=config.int("seed", 2024))
        self.u_mul_s = jnp.asarray(u * s[None, :])  # [U, q]
        self.v_mul_s = jnp.asarray(v * s[None, :])  # [I, q]
        self.u_t = jnp.asarray(u.T)  # [q, U]
        self.v_t = jnp.asarray(v.T)  # [q, I]

    def aggregate(self, params):
        user_layers = [params["user_emb"]]
        item_layers = [params["item_emb"]]
        g_user_layers = [params["user_emb"]]
        g_item_layers = [params["item_emb"]]
        for _ in range(self.num_layers):
            prev_u, prev_i = user_layers[-1], item_layers[-1]
            user_layers.append(self.graph.matmul(prev_i))
            item_layers.append(self.graph.t_matmul(prev_u))
            g_user_layers.append(self.u_mul_s @ (self.v_t @ prev_i))
            g_item_layers.append(self.v_mul_s @ (self.u_t @ prev_u))
        user_final = sum(user_layers)
        item_final = sum(item_layers)
        g_user_final = sum(g_user_layers)
        g_item_final = sum(g_item_layers)
        return user_final, item_final, g_user_final, g_item_final

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all, g_user, g_item = self.aggregate(params)

        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)

        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])

        tau = self.temperature
        gu_b = g_user[batch["user"]].astype(jnp.float32)
        gi_b = g_item[batch["pos"]].astype(jnp.float32)
        neg_score = jnp.mean(
            jnp.log(jnp.sum(jnp.exp(_matmul(gu_b, user_all.T.astype(jnp.float32)) / tau), axis=1) + 1e-8)
        )
        neg_score = neg_score + jnp.mean(
            jnp.log(jnp.sum(jnp.exp(_matmul(gi_b, item_all.T.astype(jnp.float32)) / tau), axis=1) + 1e-8)
        )
        pos_score = jnp.mean(
            jnp.clip(jnp.sum(user_e.astype(jnp.float32) * gu_b, axis=1) / tau, -5.0, 5.0)
        )
        pos_score = pos_score + jnp.mean(
            jnp.clip(jnp.sum(pos_e.astype(jnp.float32) * gi_b, axis=1) / tau, -5.0, 5.0)
        )
        ssl = self.ssl_lambda * (-pos_score + neg_score)
        return (bpr, reg, ssl), state

    def eval_embeddings(self, params, state, ctx, rng):
        user_all, item_all, _, _ = self.aggregate(params)
        return user_all, item_all
