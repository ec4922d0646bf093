"""LightGCN (He et al., SIGIR'20) — the canonical propagation model.

Capability parity with reference models/LightGCN.py: K layers of
``Â·E`` over the symmetric-normalized bipartite adjacency without
self-loops, mean layer combination including layer 0
(LightGCN.py:36-52), BPR on propagated embeddings + L2 on the ego
(layer-0) embeddings (LightGCN.py:54-72).

TPU-first: the per-layer SpMM is the sorted gather/segment-sum kernel
(idgrec_tpu.ops.spmm) with a transpose-reusing custom VJP; the whole
training epoch runs inside one jitted `lax.scan`.
"""

from __future__ import annotations

from idgrec_tpu.data.graph import normalized_adjacency
from idgrec_tpu.models.base import (
    RecModel,
    concat_user_item,
    lightgcn_propagate,
    split_user_item,
)
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses


@register("LightGCN")
class LightGCN(RecModel):
    loss_names = ("bpr", "reg")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.num_layers = config.int("GCN_layer")
        self.graph = normalized_adjacency(data)

    def propagate(self, params):
        emb0 = concat_user_item(params)
        final = lightgcn_propagate(self.graph, emb0, self.num_layers)
        return split_user_item(final, self.num_users)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.propagate(params)

        user_e = user_all[batch["user"]]
        pos_e = item_all[batch["pos"]]
        neg_e = item_all[batch["neg"]]

        ego_user = params["user_emb"][batch["user"]]
        ego_pos = params["item_emb"][batch["pos"]]
        ego_neg = params["item_emb"][batch["neg"]]

        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss(ego_user, ego_pos, ego_neg)
        return (bpr, reg), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.propagate(params)
