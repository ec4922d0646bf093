"""EGCF (Zhang et al., TOIS'24): embedding-less graph CF.

Parity with reference models/EGCF.py: only an item table exists
(EGCF.py:26-32); user embeddings are tanh(R̃·E_item). Two aggregation
modes: 'alternating' user/item ping-pong over R̃ (EGCF.py:46-65) and
'parallel' tanh propagation over the full Â after seeding users
(EGCF.py:67-84); both SUM layer outputs. Losses: BPR + reg(items) +
λ·(InfoNCE(u,u) + InfoNCE(i,i) + InfoNCE(u,i)) (EGCF.py:86-110).
The committed reference log (log/EGCF/yelp2018.log) is the golden
trace for this model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idgrec_tpu.ops.propagate import build_adjacency, build_rect_adjacency
from idgrec_tpu.models.base import RecModel, split_user_item, xavier_uniform
from idgrec_tpu.models.base import batch_final_embeddings as model_base_batch_final
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses


@register("EGCF")
class EGCF(RecModel):
    loss_names = ("bpr", "reg", "ssl")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.ssl_lambda = config.float("ssl_lambda")
        self.temperature = config.float("temperature")
        self.mode = config.str("mode")
        self.num_layers = config.int("GCN_layer")
        if self.mode == "parallel":
            # parallel mode seeds users through the SAME square Â the
            # layer chain sweeps (Â·[0; E_i] = [R̃·E_i; 0] — identical
            # scale vectors, no self-loop), so the rectangular R̃ and
            # its second device-resident matrix are not needed at all
            self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)
        else:
            self.user_graph = build_rect_adjacency(data, self.backend, compute_dtype=self.compute_dtype)

    def init_params(self, rng):
        return {"item_emb": xavier_uniform(rng, (self.num_items, self.embedding_size))}

    def propagate(self, params):
        item_emb = params["item_emb"]
        if self.mode == "parallel":
            from idgrec_tpu.ops import propagate as _prop

            # user seed tanh(R̃·E_item) via ONE square dual application:
            # Â·[0; E_i] = [Du^-1/2·R·Di^-1/2·E_i; Rᵀ·0] and tanh(0)=0,
            # so h0 = tanh(Â·x0) + x0 seeds users AND keeps E_item —
            # the same HBM-bound matrix read as a chain layer instead
            # of a separate rectangular sweep (reference EGCF.py:67-72)
            x0 = jnp.concatenate(
                [jnp.zeros((self.num_users, item_emb.shape[1]),
                           item_emb.dtype), item_emb], axis=0)
            from idgrec_tpu.ops import chainmm as _chainmm

            if _chainmm.supports_chain_resident(
                    self.graph, item_emb.shape[1], self.num_layers, "sum",
                    jnp.tanh, include_layer0=False, seed=True):
                # whole seed+tanh chain in ONE resident Pallas launch
                # (ops/chainmm.py): per-sweep HBM collapses to the
                # adjacency read + the per-layer tanh stream
                acc = _chainmm.fused_chain_resident(
                    self.graph, x0, self.num_layers, include_layer0=False,
                    reduce="sum", activation=jnp.tanh,
                    seed_users_from_items=True)
                return split_user_item(acc, self.num_users)
            if self.num_layers > 0 and _prop.supports_chain_t(
                    self.graph, item_emb.shape[1]):
                # quantized fused backend: the user seed AND every tanh
                # layer share the nibble-packed N-wide T-sweep — one
                # transposed chain end to end (reference EGCF.py:67-84;
                # sum over layer outputs)
                acc = _prop.fused_chain_t(
                    self.graph, x0, self.num_layers, include_layer0=False,
                    reduce="sum", activation=jnp.tanh,
                    seed_users_from_items=True)
                return split_user_item(acc, self.num_users)
            h = jnp.tanh(self.graph.matmul(x0)) + x0
            acc = jnp.zeros_like(h)
            for _ in range(self.num_layers):
                h = jnp.tanh(self.graph.matmul(h))
                acc = acc + h
            return split_user_item(acc, self.num_users)
        # alternating
        user_acc = jnp.zeros((self.num_users, item_emb.shape[1]), item_emb.dtype)
        item_acc = jnp.zeros_like(item_emb)
        item_h = item_emb
        for _ in range(self.num_layers):
            user_h = jnp.tanh(self.user_graph.matmul(item_h))
            item_h = jnp.tanh(self.user_graph.t_matmul(user_h))
            user_acc = user_acc + user_h
            item_acc = item_acc + item_h
        return user_acc, item_acc

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.propagate(params)
        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)


        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_counted(
            params["item_emb"], batch["pos"], batch["neg"])
        ssl = self.ssl_lambda * (
            losses.infonce_loss(user_e, user_e, self.temperature)
            + losses.infonce_loss(pos_e, pos_e, self.temperature)
            + losses.infonce_loss(user_e, pos_e, self.temperature)
        )
        return (bpr, reg, ssl), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.propagate(params)
