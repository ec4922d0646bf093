"""MAWU (Park et al., CIKM'23): margin-aware alignment + weighted uniformity.

Parity with reference models/MAWU.py: MF/LightGCN encoder, learned
1-dim user/item margins (MAWU.py:31-32), margin-alignment via arccos
(MAWU.py:63-74, including the [B,B] margin broadcast quirk at
MAWU.py:70) and γ_u/γ_i-weighted dot-uniformity (MAWU.py:76-81).
The reference's missing ``interval`` key is fixed in our config.
"""

from __future__ import annotations

import jax

from idgrec_tpu.models.base import RecModel, xavier_uniform
from idgrec_tpu.models.base import batch_user_pos_embeddings as model_base_batch_up
from idgrec_tpu.models.encoders import EncoderSwitchMixin
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses


@register("MAWU")
class MAWU(EncoderSwitchMixin, RecModel):
    loss_names = ("align", "uniform", "reg")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.gamma_user = config.float("gamma_user")
        self.gamma_item = config.float("gamma_item")
        self.reg_lambda = config.float("reg_lambda")
        self._init_encoder(config, data)

    def init_params(self, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        # margins use torch.nn.Embedding default init (standard normal,
        # MAWU.py:31-32 — not xavier'd in the reference)
        return {
            "user_emb": xavier_uniform(k1, (self.num_users, self.embedding_size)),
            "item_emb": xavier_uniform(k2, (self.num_items, self.embedding_size)),
            "user_margin": jax.random.normal(k3, (self.num_users, 1)),
            "item_margin": jax.random.normal(k4, (self.num_items, 1)),
        }

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.encode(params)
        user_e, item_e = model_base_batch_up(
            user_all, item_all, batch, self.compute_dtype)

        margin = params["user_margin"][batch["user"]] + params["item_margin"][batch["pos"]]
        align = losses.margin_alignment_loss(user_e, item_e, margin)
        uniform = self.gamma_user * losses.dot_uniformity_loss(user_e) + \
            self.gamma_item * losses.dot_uniformity_loss(item_e)

        reg = self.reg_lambda * (losses.reg_loss_counted(params["user_emb"], batch["user"])
            + losses.reg_loss_counted(params["item_emb"], batch["pos"]))
        return (align, uniform, reg), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.encode(params)
