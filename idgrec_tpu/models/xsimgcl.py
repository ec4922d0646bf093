"""XSimGCL (Yu et al., arXiv'22): single-pass cross-layer contrast.

Parity with reference models/XSimGCL.py: ONE noisy propagation pass in
training (XSimGCL.py:50-58); contrast the layer-``cl_layer`` embedding
against the final mean over layers 1..K (XSimGCL.py:60-67,88-89), over
unique batch users/items. Clean pass for evaluation (XSimGCL.py:97-103).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idgrec_tpu.ops.propagate import build_adjacency
from idgrec_tpu.models.base import RecModel, concat_user_item, split_user_item
from idgrec_tpu.models.base import batch_final_embeddings as model_base_batch_final
from idgrec_tpu.models.registry import register
from idgrec_tpu.models.simgcl import first_occurrence_mask, masked_infonce_loss
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.losses import _normalize


@register("XSimGCL")
class XSimGCL(RecModel):
    loss_names = ("bpr", "reg", "ssl")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.ssl_lambda = config.float("ssl_lambda")
        self.epsilon = config.float("epsilon")
        self.temperature = config.float("temperature")
        self.cl_layer = config.int("cl_layer")
        self.num_layers = config.int("GCN_layer")
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)

    def _propagate(self, params, rng=None):
        """Returns (final mean over layers 1..K, cl-layer embedding).
        Noisy when rng is given."""
        emb0 = concat_user_item(params)
        h = emb0
        acc = jnp.zeros_like(emb0)
        cl = emb0
        for layer in range(self.num_layers):
            h = self.graph.matmul(h)
            if rng is not None:
                rng, key = jax.random.split(rng)
                noise = jax.random.uniform(key, h.shape, dtype=h.dtype)
                h = h + jnp.sign(h) * _normalize(noise) * self.epsilon
            acc = acc + h
            if layer == self.cl_layer - 1:
                cl = h
        return acc / self.num_layers, cl

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        final, cl = self._propagate(params, rng)
        user_all, item_all = split_user_item(final, self.num_users)
        user_cl, item_cl = split_user_item(cl, self.num_users)

        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)

        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])

        u_mask = first_occurrence_mask(batch["user"])
        i_mask = first_occurrence_mask(batch["pos"])
        user_ssl = masked_infonce_loss(
            user_cl[batch["user"]], user_e, u_mask, self.temperature
        )
        item_ssl = masked_infonce_loss(
            item_cl[batch["pos"]], pos_e, i_mask, self.temperature
        )
        ssl = self.ssl_lambda * (user_ssl + item_ssl)
        return (bpr, reg, ssl), state

    def eval_embeddings(self, params, state, ctx, rng):
        final, _ = self._propagate(params, rng=None)
        return split_user_item(final, self.num_users)
