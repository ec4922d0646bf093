"""NCL (Lin et al., WWW'22): neighborhood-enriched contrastive learning.

Parity with reference models/NCL.py:

* LightGCN aggregation keeping the per-layer list (NCL.py:48-64);
* structural contrast: sum-reduced InfoNCE between layer ``2·cl_layer``
  and layer 0 against the full layer-0 table (NCL.py:99-108,129-142),
  combined as ``ssl_lambda·(user + alpha·item)``;
* prototype contrast from epoch ≥ 20: k-means over the ego tables each
  epoch (faiss on CPU in the reference, NCL.py:66-81,174-178 — here
  on-device Lloyd iterations, idgrec_tpu.ops.kmeans), InfoNCE against
  each sample's centroid, scaled by ``proto_lambda · batch_size``
  (NCL.py:114-123).

Deviation (documented): the loss list always has 4 entries here; the
prototype term is exactly 0 before the warm-up epoch instead of being
absent (the reference returns a 3-list then, NCL.py:110-112) — keeps
the jitted epoch program non-polymorphic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.models.base import (
    batch_final_embeddings as model_base_batch_final,
    RecModel,
    concat_user_item,
    lightgcn_layer_outputs,
    split_user_item,
)
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.kmeans import kmeans
from idgrec_tpu.ops.propagate import build_adjacency


@register("NCL")
class NCL(RecModel):
    loss_names = ("bpr", "reg", "ssl", "proto")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.ssl_lambda = config.float("ssl_lambda")
        self.proto_lambda = config.float("proto_lambda")
        self.k = config.int("k")
        self.alpha = config.float("alpha")
        self.temperature = config.float("temperature")
        self.cl_layer = config.int("cl_layer")
        self.num_layers = config.int("GCN_layer")
        self.batch_size = config.int("batch_size")
        # reference hardcodes epoch 20 (NCL.py:110,177); configurable here
        self.warmup_epochs = config.int("warmup_epochs", 20)
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)

    def epoch_context(self, params, state, epoch, np_rng):
        d = self.embedding_size
        if epoch >= self.warmup_epochs:
            seed = int(np_rng.integers(0, 2**31 - 1))
            k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
            user_c, user_a = kmeans(k1, params["user_emb"], self.k)
            item_c, item_a = kmeans(k2, params["item_emb"], self.k)
        else:
            user_c = jnp.zeros((self.k, d), jnp.float32)
            item_c = jnp.zeros((self.k, d), jnp.float32)
            user_a = jnp.zeros((self.num_users,), jnp.int32)
            item_a = jnp.zeros((self.num_items,), jnp.int32)
        return {
            "user_centroids": user_c,
            "user_2cluster": user_a,
            "item_centroids": item_c,
            "item_2cluster": item_a,
        }

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

        init_u, init_i = split_user_item(layer_outs[0], self.num_users)
        layer_u, layer_i = split_user_item(layer_outs[self.cl_layer * 2], self.num_users)
        user_ssl = losses.infonce_loss_sum(
            layer_u[batch["user"]], init_u[batch["user"]], init_u, self.temperature
        )
        item_ssl = losses.infonce_loss_sum(
            layer_i[batch["pos"]], init_i[batch["pos"]], init_i, self.temperature
        )
        ssl = self.ssl_lambda * (user_ssl + self.alpha * item_ssl)

        user_centroid = ctx["user_centroids"][ctx["user_2cluster"][batch["user"]]]
        item_centroid = ctx["item_centroids"][ctx["item_2cluster"][batch["pos"]]]
        user_proto = losses.infonce_loss(
            init_u[batch["user"]], user_centroid, self.temperature
        )
        item_proto = losses.infonce_loss(
            init_i[batch["pos"]], item_centroid, self.temperature
        )
        proto = self.proto_lambda * (user_proto + item_proto) * self.batch_size
        proto = jnp.where(epoch >= self.warmup_epochs, proto, 0.0)

        return (bpr, reg, ssl, proto), state

    def eval_embeddings(self, params, state, ctx, rng):
        emb0 = concat_user_item(params)
        layer_outs = lightgcn_layer_outputs(self.graph, emb0, self.num_layers)
        final = jnp.mean(jnp.stack(layer_outs, axis=0), axis=0)
        return split_user_item(final, self.num_users)
