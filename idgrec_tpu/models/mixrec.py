"""MixRec (Zhang et al., WWW'25): individual & collective mixing.

Parity with reference models/MixRec.py: LightGCN SUM aggregation
without layer 0 (MixRec.py:44-60); per step draws
``user_beta, item_beta ~ Beta(alpha, beta)`` and a Dirichlet(γ) weight
vector over the batch (MixRec.py:100-103); builds individually-mixed
views (per-sample convex blends with a shuffled batch) and collective
views (the Dirichlet-weighted batch average, a single [1, d] row
appended to the negative pools, MixRec.py:106-140); losses
``[β_i·BPR, (1-β_i)·InfoNCE_all(u, i⁺, mixed negatives),
reg, λ·mixed-view InfoNCE blends]`` (MixRec.py:127-152). The
reference's hardcoded ``.cuda()`` calls (MixRec.py:74-75,109-110 —
GPU-only bug per SURVEY §2.3) have no analogue here.
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
)
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.propagate import build_adjacency


@register("MixRec")
class MixRec(RecModel):
    loss_names = ("bpr", "bpr_mix", "reg", "ssl")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.ssl_lambda = config.float("ssl_lambda")
        self.alpha = config.float("alpha")
        self.beta = config.float("beta")
        self.gamma = config.float("gamma")
        self.temperature = config.float("temperature")
        self.num_layers = config.int("GCN_layer")
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)

    def propagate(self, params):
        emb0 = concat_user_item(params)
        final = lightgcn_propagate(
            self.graph, emb0, self.num_layers, include_layer0=False, reduce="sum"
        )
        return split_user_item(final, self.num_users)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.propagate(params)
        b = batch["user"].shape[0]
        k_ub, k_ib, k_dir, k_up, k_ip = jax.random.split(rng, 5)

        user_beta = jax.random.beta(k_ub, self.alpha, self.beta)
        item_beta = jax.random.beta(k_ib, self.alpha, self.beta)
        neg_beta = jax.random.dirichlet(k_dir, jnp.full((b,), self.gamma))  # [B]

        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)
        user_e = user_e.astype(jnp.float32)
        pos_e = pos_e.astype(jnp.float32)
        neg_e = neg_e.astype(jnp.float32)

        # collective (Dirichlet) mixing -> one row (MixRec.py:103-107)
        mix_user = jnp.sum(neg_beta[:, None] * user_e, axis=0, keepdims=True)
        mix_pos = jnp.sum(neg_beta[:, None] * pos_e, axis=0, keepdims=True)

        user_perm = jax.random.permutation(k_up, b)
        item_perm = jax.random.permutation(k_ip, b)
        user_e2 = user_e[user_perm]
        pos_e2 = pos_e[item_perm]
        neg_e2 = neg_e[item_perm]

        cl_user = user_beta * user_e + (1.0 - user_beta) * user_e2
        cl_item = item_beta * pos_e + (1.0 - item_beta) * pos_e2
        mix_neg2 = item_beta * neg_e + (1.0 - item_beta) * neg_e2


        bpr = item_beta * losses.bpr_loss(user_e, pos_e, neg_e)
        bpr_mix = (1.0 - item_beta) * losses.infonce_loss_all(user_e, pos_e, mix_neg2, 1.0)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])

        cl_user_2 = jnp.concatenate([user_e2, mix_user], axis=0)
        cl_item_2 = jnp.concatenate([pos_e2, mix_pos], axis=0)
        cl_user_3 = jnp.concatenate([user_e, mix_user], axis=0)
        cl_item_3 = jnp.concatenate([pos_e, mix_pos], axis=0)

        t = self.temperature
        user_loss = losses.infonce_loss_all(user_e, cl_user, cl_user_2, t)
        user_loss_2 = losses.infonce_loss_all(user_e2, cl_user, cl_user_3, t)
        user_ssl = user_beta * user_loss + (1.0 - user_beta) * user_loss_2
        item_loss = losses.infonce_loss_all(pos_e, cl_item, cl_item_2, t)
        item_loss_2 = losses.infonce_loss_all(pos_e2, cl_item, cl_item_3, t)
        item_ssl = item_beta * item_loss + (1.0 - item_beta) * item_loss_2
        ssl = self.ssl_lambda * (user_ssl + item_ssl)

        return (bpr, bpr_mix, reg, ssl), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.propagate(params)
