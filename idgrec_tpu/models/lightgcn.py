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

import jax.numpy as jnp

from idgrec_tpu.ops.propagate import build_adjacency
from idgrec_tpu.models.base import (
    RecModel,
    concat_user_item,
    lightgcn_propagate,
    lightgcn_propagate_rows,
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
        # batch-row partial propagation (ops/gathermm.py) is opt-in:
        # measured on v5e, per-row DMA descriptors cost ~1µs each,
        # capping row gathers at ~12-38 GB/s — slower than simply
        # recomputing the full-graph application it would replace
        self.batch_rows = config.int("batch_rows_propagation", 0) == 1
        self.graph = build_adjacency(
            data, "sym", self.backend, compute_dtype=self.compute_dtype,
            with_transpose=self.batch_rows, emb_size=self.embedding_size,
        )

    def propagate(self, params):
        emb0 = concat_user_item(params)
        final = lightgcn_propagate(self.graph, emb0, self.num_layers)
        return split_user_item(final, self.num_users)

    def _batch_final(self, params, batch):
        """Final embeddings for exactly the batch rows. When the graph
        supports row-partial products, the last layer (and, through
        autodiff, the first backward application) runs at O(B·N·d)
        instead of a full-graph application — same math to f32
        round-off (tests/test_propagate.py pins the equivalence)."""
        emb0 = concat_user_item(params)
        if self.batch_rows and getattr(self.graph, "supports_rows", False):
            rows_i = jnp.concatenate([batch["pos"], batch["neg"]])
            u_final, i_final = lightgcn_propagate_rows(
                self.graph, emb0, self.num_layers, batch["user"], rows_i,
                self.num_users,
            )
            pos_e, neg_e = jnp.split(i_final, 2, axis=0)
            return u_final, pos_e, neg_e
        user_all, item_all = self.propagate(params)
        from idgrec_tpu.ops import scatter as _scatter

        if _scatter.supports_fast_scatter(self.num_users + self.num_items,
                                          user_all.shape[1],
                                          self.compute_dtype):
            # backward's batch-cotangent row scatters run the Pallas
            # kernel (~4.8x XLA's scatter — ops/scatter.py)
            return _scatter.gather_batch_embeddings(
                user_all, item_all, batch["user"], batch["pos"],
                batch["neg"])
        return (user_all[batch["user"]], item_all[batch["pos"]],
                item_all[batch["neg"]])

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_e, pos_e, neg_e = self._batch_final(params, batch)

        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        # scatter-free ego-L2 backward (losses.reg_loss_indexed): same
        # value as reg_loss on the gathered ego rows, ~0.2 ms/step
        # cheaper gradient on v5e
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])
        return (bpr, reg), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.propagate(params)
