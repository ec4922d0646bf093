"""MF-BPR: matrix factorization with the BPR pairwise loss.

Capability parity with reference models/MFBPR.py: raw embedding tables,
BPR + λ·L2 regularization (MFBPR.py:29-42), sigmoid dot-product scoring
(MFBPR.py:44-49). The extensible template model of the zoo.
"""

from __future__ import annotations

import jax.numpy as jnp

from idgrec_tpu.models.base import RecModel
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses


@register("MFBPR")
class MFBPR(RecModel):
    loss_names = ("bpr", "reg")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_e = params["user_emb"][batch["user"]]
        pos_e = params["item_emb"][batch["pos"]]
        neg_e = params["item_emb"][batch["neg"]]

        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])
        return (bpr, reg), state

    def eval_embeddings(self, params, state, ctx, rng):
        return params["user_emb"], params["item_emb"]
