"""DirectAU (Wang et al., KDD'22): alignment + uniformity, no negatives.

Parity with reference models/DirectAU.py: MF or LightGCN encoder
(DirectAU.py:33-37,59-66), losses align + γ·(uniform_u + uniform_i)/2 +
λ·reg on ego embeddings (DirectAU.py:68-78). The reference config lacks
the ``interval`` key and crashes in the universal trainer
(SURVEY §2.1); our config ships it.
"""

from __future__ import annotations

from idgrec_tpu.models.base import RecModel
from idgrec_tpu.models.base import batch_user_pos_embeddings as model_base_batch_up
from idgrec_tpu.models.encoders import EncoderSwitchMixin
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses


@register("DirectAU")
class DirectAU(EncoderSwitchMixin, RecModel):
    loss_names = ("align", "uniform", "reg")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.gamma = config.float("gamma")
        self.reg_lambda = config.float("reg_lambda")
        self._init_encoder(config, data)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.encode(params)
        user_e, item_e = model_base_batch_up(
            user_all, item_all, batch, self.compute_dtype)

        align = losses.align_loss(user_e, item_e)
        uniform = self.gamma * (
            losses.uniform_loss(user_e) + losses.uniform_loss(item_e)
        ) / 2.0

        reg = self.reg_lambda * (losses.reg_loss_counted(params["user_emb"], batch["user"])
            + losses.reg_loss_counted(params["item_emb"], batch["pos"]))
        return (align, uniform, reg), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.encode(params)
