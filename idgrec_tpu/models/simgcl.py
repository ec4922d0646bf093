"""SimGCL (Yu et al., SIGIR'22): noise-perturbed contrastive views.

Parity with reference models/SimGCL.py: LightGCN aggregation WITHOUT
layer 0 in the mean (SimGCL.py:44-53); perturbed views add
``sign(e)·ε·normalize(U(0,1))`` per layer (SimGCL.py:49-51); three
aggregate passes per step (clean + 2 noisy, SimGCL.py:63-65); InfoNCE
over UNIQUE batch users/items (SimGCL.py:80-84).

TPU note on unique: `jnp.unique` is dynamic-shape; instead the batch is
deduplicated with static shape by masking duplicate occurrences (first
occurrence wins) — the InfoNCE mean then runs over unique entries only,
matching the reference exactly when padding rows are excluded.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from idgrec_tpu.ops.propagate import build_adjacency
from idgrec_tpu.models.base import RecModel, concat_user_item, split_user_item
from idgrec_tpu.models.base import batch_final_embeddings as model_base_batch_final
from idgrec_tpu.models.registry import register
from idgrec_tpu.ops import losses
from idgrec_tpu.ops.losses import _INFONCE_EPS, _f32, _matmul, _normalize


def first_occurrence_mask(ids: jnp.ndarray) -> jnp.ndarray:
    """[B] bool — True at the first occurrence of each distinct id.

    Static-shape replacement for torch.unique when only a reduction
    over unique elements is needed.
    """
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    is_first_sorted = jnp.concatenate(
        [jnp.array([True]), sorted_ids[1:] != sorted_ids[:-1]]
    )
    mask = jnp.zeros_like(is_first_sorted)
    return mask.at[order].set(is_first_sorted)


def masked_infonce_loss(
    emb_1: jnp.ndarray, emb_2: jnp.ndarray, mask: jnp.ndarray, temperature: float
) -> jnp.ndarray:
    """InfoNCE over the masked (unique) subset of rows: denominator runs
    over masked rows of emb_2, mean over masked rows — equal to
    infonce_loss(emb_1[unique], emb_2[unique], τ)."""
    emb_1 = _normalize(_f32(emb_1))
    emb_2 = _normalize(_f32(emb_2))
    m = mask.astype(jnp.float32)
    pos = jnp.exp(jnp.sum(emb_1 * emb_2, axis=-1) / temperature)
    sims = jnp.exp(_matmul(emb_1, emb_2.T) / temperature)
    ttl = jnp.sum(sims * m[None, :], axis=1)
    per_row = -jnp.log(pos / ttl + _INFONCE_EPS)
    return jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1.0)


def perturbed_propagate(graph, emb0, num_layers, epsilon, rng, include_layer0=False):
    """SimGCL-style noisy propagation (mean over layers 1..K)."""
    h = emb0
    acc = jnp.zeros_like(emb0)
    for layer in range(num_layers):
        h = graph.matmul(h)
        rng, key = jax.random.split(rng)
        noise = jax.random.uniform(key, h.shape, dtype=h.dtype)
        h = h + jnp.sign(h) * _normalize(noise) * epsilon
        acc = acc + h
    return acc / num_layers


@register("SimGCL")
class SimGCL(RecModel):
    aggregates_per_step = 3  # throughput-meter hint (SURVEY §3.3)
    loss_names = ("bpr", "reg", "ssl")

    def __init__(self, config, data):
        super().__init__(config, data)
        self.reg_lambda = config.float("reg_lambda")
        self.ssl_lambda = config.float("ssl_lambda")
        self.epsilon = config.float("epsilon")
        self.temperature = config.float("temperature")
        self.num_layers = config.int("GCN_layer")
        self.graph = build_adjacency(data, "sym", self.backend, compute_dtype=self.compute_dtype, emb_size=self.embedding_size)

    def _clean_propagate(self, params):
        emb0 = concat_user_item(params)
        h = emb0
        acc = jnp.zeros_like(emb0)
        for _ in range(self.num_layers):
            h = self.graph.matmul(h)
            acc = acc + h
        return split_user_item(acc / self.num_layers, self.num_users)

    def _train_propagate(self, params, rng):
        """All three chains (clean + 2 noisy) in ONE batched propagation.

        The three aggregate passes of the reference (SimGCL.py:63-65)
        are independent chains over the same adjacency; concatenating
        them along the feature dim means each layer reads the
        interaction matrix ONCE for all three (the step is HBM-bound
        on adjacency traffic — 3× less of it) and runs the MXU at
        d=192 instead of three half-filled d=64 passes. Identical math
        to three separate passes; only the noise RNG stream differs
        from the sequential formulation.
        """
        emb0 = concat_user_item(params)
        d = emb0.shape[1]
        k1, k2 = jax.random.split(rng)
        h = jnp.concatenate([emb0, emb0, emb0], axis=1)
        acc = jnp.zeros_like(h)
        for _ in range(self.num_layers):
            h = self.graph.matmul(h)
            hc, h1, h2 = h[:, :d], h[:, d : 2 * d], h[:, 2 * d :]
            k1, a1 = jax.random.split(k1)
            k2, a2 = jax.random.split(k2)
            n1 = jax.random.uniform(a1, h1.shape, dtype=h1.dtype)
            n2 = jax.random.uniform(a2, h2.shape, dtype=h2.dtype)
            h1 = h1 + jnp.sign(h1) * _normalize(n1) * self.epsilon
            h2 = h2 + jnp.sign(h2) * _normalize(n2) * self.epsilon
            h = jnp.concatenate([hc, h1, h2], axis=1)
            acc = acc + h
        acc = acc / self.num_layers
        return acc[:, :d], acc[:, d : 2 * d], acc[:, 2 * d :]

    def loss_terms(self, params, state, ctx, batch, rng, epoch):
        clean, view1, view2 = self._train_propagate(params, rng)
        user_all, item_all = split_user_item(clean, self.num_users)
        u1, i1 = split_user_item(view1, self.num_users)
        u2, i2 = split_user_item(view2, self.num_users)

        user_e, pos_e, neg_e = model_base_batch_final(
            user_all, item_all, batch, self.compute_dtype)

        bpr = losses.bpr_loss(user_e, pos_e, neg_e)
        reg = self.reg_lambda * losses.reg_loss_indexed(
            params["user_emb"], params["item_emb"],
            batch["user"], batch["pos"], batch["neg"])

        u_mask = first_occurrence_mask(batch["user"])
        i_mask = first_occurrence_mask(batch["pos"])
        user_ssl = masked_infonce_loss(
            u1[batch["user"]], u2[batch["user"]], u_mask, self.temperature
        )
        item_ssl = masked_infonce_loss(
            i1[batch["pos"]], i2[batch["pos"]], i_mask, self.temperature
        )
        ssl = self.ssl_lambda * (user_ssl + item_ssl)
        return (bpr, reg, ssl), state

    def eval_embeddings(self, params, state, ctx, rng):
        return self._clean_propagate(params)
