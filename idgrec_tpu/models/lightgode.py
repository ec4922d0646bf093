"""LightGODE (Zhang et al., CIKM'24): post-training graph ODE.

Parity with reference models/LightGODE.py: training is pure MF with
alignment + γ·uniformity + reg (LightGODE.py:54-71); at evaluation the
embeddings are integrated through ``dx/dt = Â·x + e₀`` with a euler
solver over t ∈ [0, T] (LightGODE.py:112-143 — torchdiffeq with grid
[0, T], i.e. one euler step of size T; see idgrec_tpu.ops.ode).

``train_strategy`` (LightGODE.py:26-31):
* 'MF'      — MF in training AND evaluation;
* 'GODE'    — ODE encoder in training and evaluation;
* 'MF_init' — behaves EXACTLY like 'GODE' in this reference: the
  model's ``use_mf`` stays ``None`` for MF_init, so the per-forward
  ``encoder.update(self.use_mf == self.training)`` (LightGODE.py:47-48)
  computes ``None == True -> False`` and the ODE integrates during
  TRAINING forwards too (verified empirically against the reference
  code; its ``train_stage`` is permanently 'pretrain', LightGODE.py:25).
  The name suggests "MF while training, ODE at eval", but parity means
  reproducing what the code does, not what the name implies.

The reference caches the integrated embeddings between eval batches
(restore_user/item, LightGODE.py:73-83); this evaluator computes
`eval_embeddings` once per sweep, which subsumes that cache.
"""

from __future__ import annotations

import jax.numpy as jnp

from idgrec_tpu.models.base import RecModel, concat_user_item, split_user_item
from idgrec_tpu.models.base import batch_user_pos_embeddings as model_base_batch_up
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.ode import odeint_euler
from idgrec_tpu.ops.propagate import build_adjacency


@register("LightGODE")
class LightGODE(RecModel):
    loss_names = ("align", "uniform", "reg")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.gamma = config.float("gamma")
        self.reg_lambda = config.float("reg_lambda")
        self.t = config.float("t")
        self.train_strategy = config.str("train_strategy")
        if self.train_strategy not in ("MF", "GODE", "MF_init"):
            raise ValueError(f"unknown train_strategy {self.train_strategy!r}")
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)

    def _ode_embeddings(self, params):
        e0 = concat_user_item(params).astype(jnp.float32)

        def f(t, x):
            return self.graph.matmul(x) + e0

        z = odeint_euler(f, e0, [0.0, self.t])
        return split_user_item(z, self.num_users)

    def _embeddings(self, params, training):
        # only 'MF' ever uses raw tables — 'MF_init' degenerates to the
        # ODE path in train AND eval (see module docstring)
        del training
        use_mf = self.train_strategy == "MF"
        if use_mf:
            return params["user_emb"], params["item_emb"]
        return self._ode_embeddings(params)

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        user_all, item_all = self._embeddings(params, training=True)
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
        return self._embeddings(params, training=False)
