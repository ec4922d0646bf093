"""LightCCF (Zhang et al., SIGIR'25): neighborhood-aggregation contrast.

Parity with reference models/LightCCF.py: MF/LightGCN encoder
(LightCCF.py:59-63), BPR + reg + λ·neighborhood-aggregation loss
(LightCCF.py:81-94).
"""

from __future__ import annotations

from idgrec_tpu.models.base import RecModel
from idgrec_tpu.models.base import batch_final_embeddings as model_base_batch_final
from idgrec_tpu.models.encoders import EncoderSwitchMixin
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses


@register("LightCCF")
class LightCCF(EncoderSwitchMixin, RecModel):
    loss_names = ("bpr", "reg", "na")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.ssl_lambda = config.float("ssl_lambda")
        self.temperature = config.float("temperature")
        self._init_encoder(config, data)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.encode(params)
        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)


        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])
        na = self.ssl_lambda * losses.neighbor_aggregate_loss(
            user_e, pos_e, self.temperature
        )
        return (bpr, reg, na), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.encode(params)
