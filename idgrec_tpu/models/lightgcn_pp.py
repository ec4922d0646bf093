"""LightGCN++ (Lee et al., RecSys'24).

Parity with reference models/LightGCN_pp.py: generalized normalization
``Ã = D^-α A D^-β`` built and cached per (α, β)
(LightGCN_pp.py:42-73); per-layer L2 row-normalization before each
propagation (LightGCN_pp.py:82-87); final =
γ·e⁰ + (1-γ)·mean(layers 1..K) (LightGCN_pp.py:89-92).
"""

from __future__ import annotations

import jax.numpy as jnp

from idgrec_tpu.ops.propagate import build_adjacency
from idgrec_tpu.models.base import RecModel, concat_user_item, split_user_item
from idgrec_tpu.models.base import batch_final_embeddings as model_base_batch_final
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses


@register("LightGCN_pp")
class LightGCNPP(RecModel):
    loss_names = ("bpr", "reg")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.gamma = config.float("gamma")
        self.num_layers = config.int("GCN_layer")
        alpha = config.float("alpha")
        beta = config.float("beta")
        self.graph = build_adjacency(
            data, "gen", self.backend, alpha=alpha, beta=beta,
            compute_dtype=self.compute_dtype, emb_size=self.embedding_size,
        )

    def propagate(self, params):
        emb0 = concat_user_item(params)
        h = emb0
        acc = jnp.zeros_like(emb0)
        for _ in range(self.num_layers):
            norm = jnp.linalg.norm(h, axis=1) + 1e-12
            h = h / norm[:, None]
            h = self.graph.matmul(h)
            acc = acc + h
        prop = acc / self.num_layers
        final = self.gamma * emb0 + (1.0 - self.gamma) * prop
        return split_user_item(final, self.num_users)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.propagate(params)
        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)
        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])
        return (bpr, reg), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.propagate(params)
