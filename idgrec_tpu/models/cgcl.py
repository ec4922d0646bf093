"""CGCL (He et al., SIGIR'23): candidate-aware graph contrastive learning.

Parity with reference models/CGCL.py: LightGCN aggregation keeping the
per-layer list (CGCL.py:44-60); three sum-reduced cross-layer InfoNCE
loss heads, each an α-weighted blend of a user-side and an item-side
contrast against the FULL table of the partner layer:

* layer loss:     layer-2 (context) vs layer-0 (center)  CGCL.py:93-128
* candidate loss: layer-1 (candidate) vs layer-0         CGCL.py:130-166
* struct loss:    layer-2 (neighbor) vs layer-1 (center) CGCL.py:168-202

In each head the "user side" contrasts the partner layer's ITEM rows
(at the batch positives) against the current layer's user table, and
vice versa — that cross-wiring is the model's candidate-awareness and
is kept exactly.
"""

from __future__ import annotations

from idgrec_tpu.models.base import (
    batch_final_embeddings as model_base_batch_final,
    RecModel,
    concat_user_item,
    lightgcn_layer_outputs,
    split_user_item,
)
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.propagate import build_adjacency

import jax.numpy as jnp


@register("CGCL")
class CGCL(RecModel):
    loss_names = ("bpr", "reg", "layer_ssl", "candidate_ssl", "struct_ssl")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.l_alpha = config.float("ssl_lambda_alpha")
        self.l_beta = config.float("ssl_lambda_beta")
        self.l_gamma = config.float("ssl_lambda_gamma")
        self.alpha = config.float("alpha")
        self.beta = config.float("beta")
        self.gamma = config.float("gamma")
        self.temperature = config.float("temperature")
        self.num_layers = config.int("GCN_layer")
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)

    def _pair_loss(self, cur_emb, pre_emb, users, items, lam, blend):
        """One CGCL head: (user-side, item-side) sum-InfoNCE blend.

        cur/pre are full [U+I, d] stacks of two layers (CGCL.py:93-128).
        """
        cur_u, cur_i = split_user_item(cur_emb, self.num_users)
        pre_u, pre_i = split_user_item(pre_emb, self.num_users)
        user_loss = losses.infonce_loss_sum(
            cur_i[items], pre_u[users], pre_u, self.temperature
        )
        item_loss = losses.infonce_loss_sum(
            cur_u[users], pre_i[items], pre_i, self.temperature
        )
        return lam * (blend * user_loss + (1.0 - blend) * item_loss)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        emb0 = concat_user_item(params)
        layer_outs = lightgcn_layer_outputs(self.graph, emb0, self.num_layers)
        final = jnp.mean(jnp.stack(layer_outs, axis=0), axis=0)
        user_all, item_all = split_user_item(final, self.num_users)

        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)

        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])

        center = layer_outs[0]
        candidate = layer_outs[1]
        context = layer_outs[2]
        users, items = batch["user"], batch["pos"]
        layer_ssl = self._pair_loss(context, center, users, items, self.l_alpha, self.alpha)
        candidate_ssl = self._pair_loss(candidate, center, users, items, self.l_beta, self.beta)
        struct_ssl = self._pair_loss(context, candidate, users, items, self.l_gamma, self.gamma)

        return (bpr, reg, layer_ssl, candidate_ssl, struct_ssl), state

    def eval_embeddings(self, params, state, ctx, rng):
        emb0 = concat_user_item(params)
        layer_outs = lightgcn_layer_outputs(self.graph, emb0, self.num_layers)
        final = jnp.mean(jnp.stack(layer_outs, axis=0), axis=0)
        return split_user_item(final, self.num_users)
