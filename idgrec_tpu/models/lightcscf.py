"""LightCSCF (Kai et al., AAAI'26): parallel graph-filter contrast.

Parity with reference models/LightCSCF.py: MF mode returns
[bpr, reg, cscf]; LightGCN mode returns [reg, cscf] (no BPR —
LightCSCF.py:58-91). Loss = dual-filter InfoNCE with a margin-ReLU
second channel (LightCSCF.py:93-104). Note the reference reads
``lambda_reg`` instead of ``reg_lambda``.
"""

from __future__ import annotations

from idgrec_tpu.models.base import RecModel
from idgrec_tpu.models.base import batch_final_embeddings as model_base_batch_final
from idgrec_tpu.models.encoders import EncoderSwitchMixin
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses


@register("LightCSCF")
class LightCSCF(EncoderSwitchMixin, RecModel):
    def __init__(self, config, data):
        super().__init__(config, data)
        self.temperature = config.float("temperature")
        self.lambda_gamma = config.float("lambda_gamma")
        self.lambda_reg = config.float("lambda_reg")
        self.lambda_margin = config.float("lambda_margin")
        self._init_encoder(config, data)
        self.loss_names = (
            ("bpr", "reg", "cscf") if self.encoder == "MF" else ("reg", "cscf")
        )

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.encode(params)
        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)


        reg = self.lambda_reg * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])
        cscf = self.lambda_gamma * losses.lightcscf_loss(
            user_e, pos_e, self.temperature, self.lambda_margin
        )
        if self.encoder == "MF":
            bpr = losses.bpr_loss(user_e, pos_e, neg_e)
            return (bpr, reg, cscf), state
        return (reg, cscf), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.encode(params)
