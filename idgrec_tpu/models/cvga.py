"""CVGA (Zhang et al., TOIS'23): collaborative variational graph AE.

Parity with reference models/CVGA.py: the encoder applies a Linear
layer to the normalized rectangular graph R̃ itself
(``h = Linear(R̃) = R̃ @ Wᵀ + b``, CVGA.py:40-53 — a single q-layer
producing [U, 2·emb] split into (μ, logσ²) after dropout);
reparameterize; decode with a single Linear(emb → num_items)
(CVGA.py:55-61); ELBO loss with anneal 1.0 (CVGA.py:69-78).

Training batches over USERS with dense interaction rows as targets
(custom trainer CVGA.py:101-150) — here via ``batching='user_rows'``:
the engine feeds shuffled user-id batches and the model materializes
the dense rows on device from its padded CSR constants.

Scoring parity: the decoder output is returned RAW (no sigmoid,
CVGA.py:80-85); reparameterization noise is drawn at eval too
(CVGA.py:81-83 — torch's randn_like runs regardless of eval mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.models.base import RecModel, dropout, torch_linear_init
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.propagate import build_rect_adjacency


@register("CVGA")
class CVGA(RecModel):
    loss_names = ("recon", "kl")
    batching = "user_rows"

    def __init__(self, config, data):
        super().__init__(config, data)
        self.dropout_rate = config.float("dropout")
        self.graph = build_rect_adjacency(data, self.backend, compute_dtype=self.compute_dtype)
        # padded per-user positives for on-device dense-row materialization
        degrees = np.diff(data.row_ptr)
        width = max(1, int(degrees.max()))
        pos = np.full((data.num_users, width), data.num_items, np.int32)
        vals = np.zeros((data.num_users, width), np.float32)
        for u in range(data.num_users):
            s, e = data.row_ptr[u], data.row_ptr[u + 1]
            pos[u, : e - s] = data.col_idx[s:e]
            vals[u, : e - s] = data.csr_vals[s:e]
        self._padded_pos = jnp.asarray(pos)
        self._padded_vals = jnp.asarray(vals)

    def init_params(self, rng):
        k1, k2 = jax.random.split(rng)
        d = self.embedding_size
        q_w, q_b = torch_linear_init(k1, self.num_items, 2 * d)
        p_w, p_b = torch_linear_init(k2, d, self.num_items)
        return {"q_w": q_w, "q_b": q_b, "p_w": p_w, "p_b": p_b}

    def _dense_rows(self, users):
        b = users.shape[0]
        rows = jnp.zeros((b, self.num_items), jnp.float32)
        r_idx = jnp.repeat(jnp.arange(b), self._padded_pos.shape[1])
        c_idx = self._padded_pos[users].reshape(-1)
        v = self._padded_vals[users].reshape(-1)
        return rows.at[r_idx, c_idx].add(v, mode="drop")

    def encode(self, params, rng, training):
        # h = R̃ @ q_w + q_b: Linear applied to the graph (CVGA.py:43)
        h = self.graph.matmul(params["q_w"]) + params["q_b"][None, :]
        if training:
            h = dropout(rng, h, self.dropout_rate)
        d = self.embedding_size
        return h[:, :d], h[:, d:]

    def decode(self, params, z):
        return z @ params["p_w"] + params["p_b"]

    def reparameterize(self, rng, mu, logvar):
        std = jnp.exp(0.5 * logvar)
        eps = jax.random.normal(rng, std.shape, std.dtype)
        return eps * std + mu

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        users = batch["user"]
        x = self._dense_rows(users)
        k_drop, k_eps = jax.random.split(rng)
        mu, logvar = self.encode(params, k_drop, training=True)
        z = self.reparameterize(k_eps, mu, logvar)
        recon = self.decode(params, z[users])
        recon_loss, kl = losses.elbo_loss(recon, x, mu[users], logvar[users], 1.0)
        return (recon_loss, kl), state

    def eval_embeddings(self, params, state, ctx, rng):
        k_drop, k_eps = jax.random.split(rng)
        mu, logvar = self.encode(params, k_drop, training=False)
        z = self.reparameterize(k_eps, mu, logvar)
        return {"z": z, "p_w": params["p_w"], "p_b": params["p_b"]}

    def score_batch(self, eval_repr, users):
        return self.decode(
            {"p_w": eval_repr["p_w"], "p_b": eval_repr["p_b"]}, eval_repr["z"][users]
        )
