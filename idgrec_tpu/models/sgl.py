"""SGL (Wu et al., SIGIR'21): self-supervised graph learning.

Parity with reference models/SGL.py: LightGCN aggregation over the full
graph for BPR + over two per-epoch augmented graphs for the contrastive
views (SGL.py:60-89). Augmentations (SGL.py:126-143, tools.py:67-92):

* 'ed' (edge dropout) / 'nd': two subgraphs shared across layers;
* 'rw' (random walk): an independent subgraph per layer per view.

'nd' raises NotImplementedError in the reference (tools.py:72-73) and
here. The InfoNCE contrast uses raw batch indices, not uniques
(SGL.py:79-83). The reference's SGL trainer tracks but never acts on
early stopping and runs a final evaluation after the last epoch
(SGL.py:188-197) — mirrored via ``respects_early_stop = False``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from idgrec_tpu.models.base import (
    batch_final_embeddings as model_base_batch_final,
    RecModel,
    concat_user_item,
    lightgcn_propagate,
    split_user_item,
)
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.propagate import (
    DenseSquareAdj,
    build_adjacency,
    build_dropout_adjacency,
    build_dropout_shared,
    shared_chain_matmul,
)


@register("SGL")
class SGL(RecModel):
    aggregates_per_step = 3  # throughput-meter hint (SURVEY §3.3)
    loss_names = ("bpr", "reg", "ssl")
    respects_early_stop = False

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.ssl_lambda = config.float("ssl_lambda")
        self.temperature = config.float("temperature")
        self.ssl_ratio = config.float("ssl_ratio")
        self.aug_type = config.str("aug_type")
        if self.aug_type == "nd":
            raise NotImplementedError(
                "aug_type 'nd' is not implemented (reference tools.py:72-73)"
            )
        if self.aug_type not in ("ed", "rw"):
            raise ValueError(f"unknown aug_type {self.aug_type!r}")
        self.num_layers = config.int("GCN_layer")
        # resolve 'auto' ONCE with copies=2 (main adjacency + the
        # dropout-shared binary matrix coexist in HBM) so the main and
        # dropout builders can never split their backend selection
        from idgrec_tpu.ops.propagate import resolve_backend

        self.backend = resolve_backend(
            data, self.backend, copies=2, compute_dtype=self.compute_dtype
        )
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)
        # feature-batched propagation: all 3 chains (clean + 2 views)
        # share ONE sweep of the binary matrix per layer
        # (shared_chain_matmul) — valid when the clean operator also
        # factors over the binary matrix (binary interaction counts)
        # and the dense backend is in play
        self._batched = (
            isinstance(self.graph, DenseSquareAdj)
            and not self.graph.has_diag
            and self.graph.quant == "none"
            and bool(np.all(data.csr_vals == 1))
        )
        # quantized twin: the fused backend's m8 IS the shared binary
        # matrix when counts are binary, so all 3 chains feature-batch
        # into one [3d, N] quantized T-kernel sweep per layer
        # (ops/propagate.fused_chain_views_t); mesh/VMEM fit is checked
        # at trace time (supports_chain_views_t)
        from idgrec_tpu.ops.propagate import FusedSquareAdj

        self._batched_quant = (
            isinstance(self.graph, FusedSquareAdj)
            and self.graph.quant in ("int8", "int4")
            and not self.graph.has_diag
            and bool(np.all(data.csr_vals == 1))
        )
        # shared matrix state for dropout views (uploaded once). Under
        # int8 quant with binary counts the padded m8 IS the binary
        # matrix — alias it instead of uploading a second ~1.2 GB copy
        # (DenseDropSquareAdj handles padded m_bin; the views' own
        # matmul only runs on the non-batched fallback path)
        if self._batched_quant and self.graph.quant == "int8":
            self._m_bin = self.graph.m8
        else:
            self._m_bin = build_dropout_shared(data, self.backend)

    def epoch_context(self, params, state, epoch, np_rng):
        """Two augmented graphs per epoch (SGL.py:130-143); for 'rw'
        one per layer per view. Stable pytree structure across epochs."""
        def make():
            return build_dropout_adjacency(
                self.data, self.ssl_ratio, np_rng, self.backend,
                compute_dtype=self.compute_dtype, m_bin=self._m_bin,
            )

        if self.aug_type == "ed":
            return ((make(),), (make(),))
        return (
            tuple(make() for _ in range(self.num_layers)),
            tuple(make() for _ in range(self.num_layers)),
        )

    def _aggregate_multi(self, graphs, emb0):
        """LightGCN aggregation where layer L uses graphs[L % len]."""
        layers = [emb0]
        h = emb0
        for layer in range(self.num_layers):
            g = graphs[layer % len(graphs)]
            h = g.matmul(h)
            layers.append(h)
        return jnp.mean(jnp.stack(layers, axis=0), axis=0)

    def _propagate_chains(self, ctx, emb0):
        """(final, view1, view2) — batched single-sweep path when the
        dense backend + binary counts allow it, else three passes."""
        graphs_1, graphs_2 = ctx
        if self._batched_quant:
            from idgrec_tpu.ops import propagate as _prop

            if _prop.supports_chain_views_t(self.graph, 3, emb0.shape[1]):
                final, v1, v2 = _prop.fused_chain_views_t(
                    self.graph, (graphs_1, graphs_2), emb0, self.num_layers
                )
                return final, v1, v2
        if not self._batched:
            return (
                lightgcn_propagate(self.graph, emb0, self.num_layers),
                self._aggregate_multi(graphs_1, emb0),
                self._aggregate_multi(graphs_2, emb0),
            )
        hc = h1 = h2 = emb0
        acc_c, acc_1, acc_2 = emb0, emb0, emb0
        for layer in range(self.num_layers):
            g1 = graphs_1[layer % len(graphs_1)]
            g2 = graphs_2[layer % len(graphs_2)]
            hc, h1, h2 = shared_chain_matmul(
                self._m_bin, [self.graph, g1, g2], [hc, h1, h2],
                compute_dtype=self.graph.compute_dtype_name,
            )
            acc_c, acc_1, acc_2 = acc_c + hc, acc_1 + h1, acc_2 + h2
        n = self.num_layers + 1
        return acc_c / n, acc_1 / n, acc_2 / n

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        emb0 = concat_user_item(params)
        final, view1, view2 = self._propagate_chains(ctx, emb0)
        user_all, item_all = split_user_item(final, self.num_users)
        u1, i1 = split_user_item(view1, self.num_users)
        u2, i2 = split_user_item(view2, self.num_users)

        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)

        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])
        user_ssl = losses.infonce_loss(
            u1[batch["user"]], u2[batch["user"]], self.temperature
        )
        item_ssl = losses.infonce_loss(
            i1[batch["pos"]], i2[batch["pos"]], self.temperature
        )
        ssl = self.ssl_lambda * (user_ssl + item_ssl)
        return (bpr, reg, ssl), state

    def eval_embeddings(self, params, state, ctx, rng):
        emb0 = concat_user_item(params)
        final = lightgcn_propagate(self.graph, emb0, self.num_layers)
        return split_user_item(final, self.num_users)
