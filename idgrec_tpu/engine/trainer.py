"""The jitted training engine.

The reference trains with a host-side minibatch loop, one
``.item()`` device sync per loss term per batch, and a full-epoch
host->device triple upload (trainer.py:20-57 — SURVEY §3.2). Here the
entire epoch is a single jitted ``lax.scan`` over minibatches with

* donated params/optimizer/model state (no reallocation churn),
* per-term loss accumulation on device (one small transfer per epoch),
* optax Adam (same defaults as torch.optim.Adam: b1=0.9, b2=0.999,
  eps=1e-8 — trainer.py:11).

The trailing partial batch is wrapped (padded with samples from the
epoch's start) to keep shapes static; with ~1.2M samples per epoch the
effect on the trajectory is noise-level.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from idgrec_tpu.models.base import RecModel


class EpochRunner:
    """Compiles and runs one-epoch training for a model."""

    def __init__(
        self,
        model: RecModel,
        learn_rate: float,
        batch_size: int,
        num_train: int,
        optimizer: optax.GradientTransformation | None = None,
    ):
        self.model = model
        self.batch_size = int(batch_size)
        self.num_train = int(num_train)
        self.num_batches = max(1, -(-self.num_train // self.batch_size))
        self.opt = optimizer or optax.adam(learn_rate, b1=0.9, b2=0.999, eps=1e-8)
        self._run = jax.jit(self._epoch_impl, donate_argnums=(0, 1, 2))

    def init_opt_state(self, params):
        return self.opt.init(params)

    def _epoch_impl(self, params, opt_state, state, ctx, users, pos, neg, rng, epoch):
        nb, bs = self.num_batches, self.batch_size
        total = nb * bs

        def wrap(x):
            reps = -(-total // x.shape[0])
            return jnp.tile(x, reps)[:total].reshape(nb, bs)

        batches = {"user": wrap(users), "pos": wrap(pos), "neg": wrap(neg)}

        def step(carry, batch):
            params, opt_state, state, rng = carry
            rng, sub = jax.random.split(rng)

            def loss_fn(p):
                terms, new_state = self.model.loss_terms(p, state, ctx, batch, sub, epoch)
                total_loss = jnp.asarray(0.0, jnp.float32)
                for t in terms:
                    total_loss = total_loss + t
                return total_loss, (jnp.stack([jnp.asarray(t, jnp.float32) for t in terms]), new_state)

            grads, (terms, new_state) = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, new_state, rng), terms

        (params, opt_state, state, _), term_hist = jax.lax.scan(
            step, (params, opt_state, state, rng), batches
        )
        return params, opt_state, state, jnp.sum(term_hist, axis=0)

    def run_epoch(self, params, opt_state, state, ctx, users, pos, neg, rng, epoch: int):
        """Run one epoch. Returns (params, opt_state, state, loss_term_sums).

        ``epoch`` is passed as a traced scalar so epoch-conditional
        losses (NCL's proto term, models/NCL.py:110-112) don't retrace.
        """
        return self._run(
            params, opt_state, state, ctx, users, pos, neg, rng, jnp.asarray(epoch, jnp.int32)
        )
