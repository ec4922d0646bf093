"""RecDCL (Zhang et al., WWW'24): dual contrastive learning.

Parity with reference models/RecDCL.py:

* LightGCN mean aggregation (RecDCL.py:93-105);
* Barlow-Twins loss via a projector MLP (Linear→BN→ReLU→Linear) and an
  affine-free BatchNorm cross-correlation (RecDCL.py:50-82);
* polynomial-feature uniformity over projected features
  (RecDCL.py:87-91);
* BYOL-style momentum loss with STATEFUL per-user/item target
  histories updated in place each step (RecDCL.py:62-65,113-122 —
  here explicit entries in the model state carried through the epoch
  scan) and a predictor Linear (RecDCL.py:60,125);
* loss list [all_bt·bt, poly·poly_coeff, mom·mom_coeff]
  (RecDCL.py:142).

BatchNorm uses batch statistics (training mode); evaluation never
touches the projector/predictor (RecDCL.py:146-153), so running stats
are not needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idgrec_tpu.models.base import (
    RecModel,
    batch_norm,
    concat_user_item,
    lightgcn_propagate,
    split_user_item,
    torch_linear_init,
    xavier_uniform,
)
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops.losses import _f32, _matmul, _normalize
from idgrec_tpu.ops.propagate import build_adjacency


@register("RecDCL")
class RecDCL(RecModel):
    loss_names = ("bt", "poly", "mom")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")  # parsed for parity; unused
        self.num_layers = config.int("GCN_layer")
        self.a = config.float("a")
        self.polyc = config.float("polyc")
        self.degree = config.float("degree")
        self.poly_coeff = config.float("poly_coeff")
        self.bt_coeff = config.float("bt_coeff")
        self.all_bt_coeff = config.float("all_bt_coeff")
        self.mom_coeff = config.float("mom_coeff")
        self.momentum = config.float("momentum")
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)

    def init_params(self, rng):
        k1, k2, k3, k4, k5, k6 = jax.random.split(rng, 6)
        d = self.embedding_size
        # projector = Linear-BN-ReLU, Linear-BN-ReLU, Linear — the
        # reference builds TWO hidden blocks before the output layer
        # (RecDCL.py:51-58: sizes [e,e,e,e] -> len(sizes)-2 = 2 blocks),
        # all linears bias-free, hidden BNs affine
        proj_w1, _ = torch_linear_init(k3, d, d)
        proj_w2, _ = torch_linear_init(k4, d, d)
        proj_w3, _ = torch_linear_init(k6, d, d)
        pred_w, pred_b = torch_linear_init(k5, d, d)
        return {
            "user_emb": xavier_uniform(k1, (self.num_users, d)),
            "item_emb": xavier_uniform(k2, (self.num_items, d)),
            "proj_w1": proj_w1,
            "proj_bn1_gamma": jnp.ones((d,), jnp.float32),
            "proj_bn1_beta": jnp.zeros((d,), jnp.float32),
            "proj_w2": proj_w2,
            "proj_bn2_gamma": jnp.ones((d,), jnp.float32),
            "proj_bn2_beta": jnp.zeros((d,), jnp.float32),
            "proj_w3": proj_w3,
            "pred_w": pred_w,
            "pred_b": pred_b,
        }

    def init_state(self, rng):
        k1, k2 = jax.random.split(rng)
        d = self.embedding_size
        return {
            "u_target_his": jax.random.normal(k1, (self.num_users, d), jnp.float32),
            "i_target_his": jax.random.normal(k2, (self.num_items, d), jnp.float32),
        }

    def _projector(self, params, x):
        h = _f32(x) @ params["proj_w1"]
        h = batch_norm(h, params["proj_bn1_gamma"], params["proj_bn1_beta"])
        h = jax.nn.relu(h)
        h = h @ params["proj_w2"]
        h = batch_norm(h, params["proj_bn2_gamma"], params["proj_bn2_beta"])
        h = jax.nn.relu(h)
        return h @ params["proj_w3"]

    def _bt(self, params, x, y):
        d = self.embedding_size
        ue = self._projector(params, x)
        ie = self._projector(params, y)
        c = _matmul(batch_norm(ue).T, batch_norm(ie)) / x.shape[0]
        on_diag = jnp.sum((jnp.diagonal(c) - 1.0) ** 2) / d
        off_diag = (jnp.sum(c**2) - jnp.sum(jnp.diagonal(c) ** 2)) / d
        return on_diag + self.bt_coeff * off_diag

    def _poly_feature(self, params, x):
        ue = self._projector(params, x)
        bn = batch_norm(ue)
        xx = _matmul(bn.T, bn)
        poly = (self.a * xx + self.polyc) ** self.degree
        return jnp.log(jnp.mean(poly))

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        emb0 = concat_user_item(params)
        final = lightgcn_propagate(self.graph, emb0, self.num_layers)
        user_all, item_all = split_user_item(final, self.num_users)
        user_g = _f32(user_all[batch["user"]])
        pos_g = _f32(item_all[batch["pos"]])

        # momentum targets (stop-gradient, RecDCL.py:113-122)
        u_hist = state["u_target_his"][batch["user"]]
        i_hist = state["i_target_his"][batch["pos"]]
        u_target = u_hist * self.momentum + jax.lax.stop_gradient(user_g) * (1.0 - self.momentum)
        i_target = i_hist * self.momentum + jax.lax.stop_gradient(pos_g) * (1.0 - self.momentum)
        new_state = {
            "u_target_his": state["u_target_his"].at[batch["user"]].set(
                jax.lax.stop_gradient(user_g)
            ),
            "i_target_his": state["i_target_his"].at[batch["pos"]].set(
                jax.lax.stop_gradient(pos_g)
            ),
        }

        user_n = _normalize(user_g)
        pos_n = _normalize(pos_g)
        user_p = user_g @ params["pred_w"] + params["pred_b"]
        pos_p = pos_g @ params["pred_w"] + params["pred_b"]

        bt = self._bt(params, user_n, pos_n) if self.all_bt_coeff != 0 else 0.0
        poly = (
            self._poly_feature(params, user_n) / 2 + self._poly_feature(params, pos_n) / 2
            if self.poly_coeff != 0
            else 0.0
        )
        if self.mom_coeff != 0:
            cos_u = jnp.sum(_normalize(user_p) * _normalize(i_target), axis=-1)
            cos_i = jnp.sum(_normalize(pos_p) * _normalize(u_target), axis=-1)
            mom = -jnp.mean(cos_u) / 2 - jnp.mean(cos_i) / 2
        else:
            mom = 0.0

        return (
            self.all_bt_coeff * bt,
            self.poly_coeff * poly,
            self.mom_coeff * mom,
        ), new_state

    def eval_embeddings(self, params, state, ctx, rng):
        emb0 = concat_user_item(params)
        final = lightgcn_propagate(self.graph, emb0, self.num_layers)
        return split_user_item(final, self.num_users)
