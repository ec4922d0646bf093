"""The jitted training engine.

The reference trains with a host-side minibatch loop, one
``.item()`` device sync per loss term per batch, and a full-epoch
host->device triple upload (trainer.py:20-57 — SURVEY §3.2). Here an
epoch runs as a small number of jitted ``lax.scan`` segments over
minibatches with

* donated params/optimizer/model state (no reallocation churn),
* per-term loss accumulation on device (one tiny transfer per epoch),
* optax Adam (same defaults as torch.optim.Adam: b1=0.9, b2=0.999,
  eps=1e-8 — trainer.py:11).

Chunking: the epoch scan is split into segments of at most
``max_steps_per_call`` training steps. One giant device program per
epoch would be ideal, but serving environments (and the axon TPU
tunnel used here) bound single-execution wall time; segments of a few
hundred steps keep each call well under that while amortizing dispatch
overhead to noise. At most two distinct segment lengths are used, so
the engine compiles at most two scan programs per model.

The trailing partial batch is wrapped (padded with samples from the
epoch's start) to keep shapes static; with ~1.2M samples per epoch the
effect on the trajectory is noise-level.
"""

from __future__ import annotations


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
        max_steps_per_call: int = 256,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh — embedding-table rows are
        sharded over its 'model' axis, per-step batches over 'data';
        XLA inserts the table all-gathers and gradient reductions.
        Leaves with indivisible dimensions stay replicated."""
        self.model = model
        self.mesh = mesh
        self.batch_size = int(batch_size)
        if mesh is not None and self.batch_size % mesh.shape["data"] != 0:
            # caught here with a clear message instead of an opaque
            # uneven-sharding device_put failure on the first epoch
            raise ValueError(
                f"batch_size ({self.batch_size}) must be divisible by "
                f"the mesh's data axis ({mesh.shape['data']}) — pick a "
                f"divisible batch_size or a different --data_parallel"
            )
        self.num_train = int(num_train)
        self.num_batches = max(1, -(-self.num_train // self.batch_size))
        self.opt = optimizer or optax.adam(learn_rate, b1=0.9, b2=0.999, eps=1e-8)
        self.max_steps_per_call = int(max_steps_per_call)

        num_calls = max(1, -(-self.num_batches // self.max_steps_per_call))
        base = self.num_batches // num_calls
        rem = self.num_batches % num_calls
        self.segment_lengths = [base + 1] * rem + [base] * (num_calls - rem)
        assert sum(self.segment_lengths) == self.num_batches

        self._consts = model.constants()
        # pad meta: identity until shard() pads the training state
        # (single-chip runs never pad)
        self.pad_meta = None
        if mesh is not None:
            from idgrec_tpu.parallel.mesh import global_put, param_shardings

            self._consts = global_put(
                self._consts, param_shardings(self._consts, mesh)
            )
            # rebind the PLACED constants onto the model: host-side
            # epoch_context (e.g. SGL embedding its shared binary
            # matrix into every epoch's dropout views) then reuses the
            # mesh-placed arrays, and place_ctx's global_put skips
            # them instead of re-replicating gigabytes each epoch
            for k, v in self._consts.items():
                setattr(model, k, v)
        self._prepare = jax.jit(self._prepare_impl)
        self._segment = jax.jit(self._segment_impl, donate_argnums=(0, 1, 2))

    def init_opt_state(self, params):
        return self.opt.init(params)

    def shard(self, params, opt_state, state):
        """Place training state on the mesh: every large [N, d] leaf is
        zero-padded to a 128-row multiple (parallel/padding.py) and
        row-sharded over the 'model' axis — real-world row counts
        (yelp2018's 31,668/38,048) shard on any power-of-two width.
        The jitted step slices back to true shapes before model code
        runs, so training numerics are unchanged."""
        if self.mesh is None:
            return params, opt_state, state
        if self.pad_meta is not None:
            # a second call would rebuild pad_meta from ALREADY-PADDED
            # leaves (all 128-multiples -> identity meta), after which
            # unpad() would leak zero pad rows into epoch_context and
            # results — fail loud instead
            raise RuntimeError("EpochRunner.shard() was already called")
        from idgrec_tpu.parallel import padding
        from idgrec_tpu.parallel.mesh import global_put, param_shardings

        width = self.mesh.shape["model"]
        # pad exactly the node tables (and their optimizer twins):
        # leaves sized by users/items — small dense weights stay at
        # natural shape (replicated) rather than padded + row-sharded
        node_rows = {
            self.model.num_users, self.model.num_items,
            self.model.num_users + self.model.num_items,
        }
        self.pad_meta = (
            padding.build_meta(params, width, node_rows),
            padding.build_meta(state, width, node_rows),
        )
        params = padding.pad_tree(params, self.pad_meta[0])
        opt_state = padding.pad_tree(
            opt_state, padding.build_meta(opt_state, width, node_rows)
        )
        state = padding.pad_tree(state, self.pad_meta[1])
        params = global_put(params, param_shardings(params, self.mesh))
        opt_state = global_put(opt_state, param_shardings(opt_state, self.mesh))
        state = global_put(state, param_shardings(state, self.mesh))
        return params, opt_state, state

    def unpad(self, params, state):
        """True-shape views of padded training state (for results,
        serving, and single-chip consumers)."""
        if self.pad_meta is None:
            return params, state
        from idgrec_tpu.parallel import padding

        return (
            padding.unpad_tree(params, self.pad_meta[0]),
            padding.unpad_tree(state, self.pad_meta[1]),
        )

    def _shard_batches(self, batches):
        if self.mesh is None:
            return batches
        from jax.sharding import NamedSharding, PartitionSpec as P

        from idgrec_tpu.parallel.mesh import global_put

        sharding = NamedSharding(self.mesh, P(None, "data"))
        return jax.tree.map(lambda a: global_put(a, sharding), batches)

    # ------------------------------------------------------------------
    def _prepare_impl(self, users, pos, neg):
        nb, bs = self.num_batches, self.batch_size
        total = nb * bs

        def wrap(x):
            reps = -(-total // x.shape[0])
            return jnp.tile(x, reps)[:total].reshape(nb, bs)

        return {"user": wrap(users), "pos": wrap(pos), "neg": wrap(neg)}

    def _segment_impl(self, params, opt_state, state, ctx, batches, rng, epoch, consts):
        if self.pad_meta is not None:
            from idgrec_tpu.parallel import padding as _padding

            p_meta, s_meta = self.pad_meta
        else:
            _padding = p_meta = s_meta = None

        def step(carry, batch):
            params, opt_state, state, rng = carry
            rng, sub = jax.random.split(rng)
            state_t = state if s_meta is None else _padding.unpad_tree(state, s_meta)

            def loss_fn(p):
                # padded storage -> true-shape compute view; pad-row
                # cotangents are zero, so Adam never moves pad rows
                p_t = p if p_meta is None else _padding.unpad_tree(p, p_meta)
                terms, new_state = self.model.loss_terms(p_t, state_t, ctx, batch, sub, epoch)
                total_loss = jnp.asarray(0.0, jnp.float32)
                for t in terms:
                    total_loss = total_loss + t
                return total_loss, (jnp.stack([jnp.asarray(t, jnp.float32) for t in terms]), new_state)

            grads, (terms, new_state) = jax.grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if s_meta is not None:
                new_state = _padding.pad_tree(new_state, s_meta)
            return (params, opt_state, new_state, rng), terms

        from idgrec_tpu.parallel.mesh import use_mesh

        with use_mesh(self.mesh), self.model.bound_constants(consts):
            (params, opt_state, state, rng), term_hist = jax.lax.scan(
                step, (params, opt_state, state, rng), batches
            )
        return params, opt_state, state, rng, jnp.sum(term_hist, axis=0)

    # ------------------------------------------------------------------
    def run_epoch(self, params, opt_state, state, ctx, users, pos, neg, rng, epoch: int):
        """Run one epoch. Returns (params, opt_state, state, loss_term_sums).

        ``epoch`` is passed as a traced scalar so epoch-conditional
        losses (NCL's proto term, models/NCL.py:110-112) don't retrace.
        """
        epoch_arr = jnp.asarray(epoch, jnp.int32)
        batches = self._shard_batches(self._prepare(users, pos, neg))
        term_total = None
        start = 0
        for seg_len in self.segment_lengths:
            seg = jax.tree.map(lambda a: jax.lax.slice_in_dim(a, start, start + seg_len, axis=0), batches)
            params, opt_state, state, rng, terms = self._segment(
                params, opt_state, state, ctx, seg, rng, epoch_arr, self._consts
            )
            term_total = terms if term_total is None else term_total + terms
            start += seg_len
        return params, opt_state, state, term_total
