"""SCCF (Wu et al., KDD'24): unified graph-convolution/contrastive loss.

Parity with reference models/SCCF.py: MF or LightGCN encoder
(SCCF.py:54-58); single contrastive objective
``-E log(exp(s/τ) + exp(s²/τ))`` positive term over interactions and a
count-weighted all-pairs denominator over unique batch users × items
(SCCF.py:60-80). No BPR, no reg term in the loss list.

TPU-native reformulation of the unique-counts trick: the reference's
``mean(score_unique · (c_u c_iᵀ))`` equals
``sum over all B×B batch pairs of score / (n_unique_u · n_unique_i)``
(duplicates contribute exactly their multiplicity), so the loss is a
static-shape [B,B] matmul plus two sorted unique counts — no dynamic
``torch.unique`` shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idgrec_tpu.models.base import RecModel
from idgrec_tpu.models.encoders import EncoderSwitchMixin
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops.losses import _f32, _matmul, _normalize


def _count_unique(x: jnp.ndarray) -> jnp.ndarray:
    s = jnp.sort(x)
    return 1 + jnp.sum(s[1:] != s[:-1])


@register("SCCF")
class SCCF(EncoderSwitchMixin, RecModel):
    loss_names = ("up", "down")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.temperature = config.float("temperature")
        self.reg_lambda = config.float("reg_lambda")  # parsed for parity; unused in loss
        self._init_encoder(config, data)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self.encode(params)
        tau = self.temperature

        user_e = _normalize(_f32(user_all[batch["user"]]))
        pos_e = _normalize(_f32(item_all[batch["pos"]]))
        ip = jnp.sum(user_e * pos_e, axis=1)
        up = jnp.mean(jnp.log(jnp.exp(ip / tau) + jnp.exp(ip**2 / tau)))

        sim = _matmul(user_e, pos_e.T)
        score = jnp.exp(sim / tau) + jnp.exp(sim**2 / tau)
        n_uu = _count_unique(batch["user"]).astype(jnp.float32)
        n_ui = _count_unique(batch["pos"]).astype(jnp.float32)
        down = jnp.log(jnp.sum(score) / (n_uu * n_ui))

        return (-up, down), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self.encode(params)
