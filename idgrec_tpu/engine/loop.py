"""The universal training loop.

Orchestrates: per-epoch on-device sampling -> jitted epoch scan ->
interval evaluation -> early stopping -> logging, with the same
observable behavior as the reference `universal_trainer`
(utility/utility_train/trainer.py:8-74) and the custom trainer variants:

* SGL evaluates on interval but never early-stops, and runs a final
  evaluation after the last epoch (models/SGL.py:188-197) —
  models opt out via ``respects_early_stop = False``;
* NCL runs its E-step from epoch 20 (models/NCL.py:174-178) via
  `epoch_context`;
* CVGA batches over user rows (models/CVGA.py:101-150) via the
  ``user_rows`` batching mode.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.config import Config, load_model_config
from idgrec_tpu.data.dataset import Dataset
from idgrec_tpu.engine import checkpoint as ckpt
from idgrec_tpu.engine.evaluator import BestResults, Evaluator
from idgrec_tpu.engine.profiling import ThroughputMeter, debug_options, maybe_trace
from idgrec_tpu.engine.logging_utils import RunLogger, loss_string
from idgrec_tpu.engine.sampler import NegativeSampler
from idgrec_tpu.engine.trainer import EpochRunner
from idgrec_tpu.models import get_model
from idgrec_tpu.models.base import RecModel
from idgrec_tpu.parallel import distributed


@dataclass
class TrainResult:
    params: Any
    state: Any
    best: BestResults
    history: list[dict] = field(default_factory=list)
    last_result: dict | None = None
    # mesh runs only: the as-trained padded storage (row-sharded over
    # the 'model' axis, parallel/padding.py); `params`/`state` above
    # are the true-shape views, which slicing de-shards to replicated
    sharded_params: Any = None


def train_model(
    model_name: str,
    data: Dataset,
    config: Config | None = None,
    seed: int | None = None,
    log_dir: str | None = "log",
    echo: bool = True,
    max_epochs: int | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int | None = None,
    mesh=None,
    profile_dir: str | None = None,
) -> TrainResult:
    config = config or load_model_config(model_name)
    seed = seed if seed is not None else config.int("seed")
    debug_options(config)

    model_cls = get_model(model_name)
    model: RecModel = model_cls(config, data)
    model.device_put()

    # multi-host: host 0 owns all run-wide side effects (log files,
    # JSONL events, stdout echo, checkpoint writes); other hosts run
    # the same compute silently so collectives stay in lockstep
    primary = distributed.is_primary()
    logger = RunLogger(
        model_name, data.name, log_dir if primary else None, echo=echo and primary
    )
    logger.info(f"Run with {model_name} on {data.name}")
    logger.info(data.get_statistics())
    for key, value in config.items():
        logger.info(f"{key} : {value}")

    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.default_rng(seed)
    rng, p_rng, s_rng = jax.random.split(rng, 3)
    params = model.init_params(p_rng)
    state = model.init_state(s_rng)

    batching = getattr(model, "batching", "bpr_triples")
    runner = EpochRunner(
        model,
        learn_rate=config.float("learn_rate"),
        batch_size=config.int("batch_size"),
        num_train=data.num_train if batching == "bpr_triples" else data.num_users,
        mesh=mesh,
    )
    opt_state = runner.init_opt_state(params)
    params, opt_state, state = runner.shard(params, opt_state, state)
    sampler = NegativeSampler(data) if batching == "bpr_triples" else None
    sparsity_mode = config.int("sparsity_test") == 1
    if sparsity_mode:
        split_uids, split_state = data.create_sparsity_split()
        for line in split_state:
            logger.info(line)
        evaluators = [
            Evaluator(model, data, config, users=grp, mesh=mesh,
                      pad_meta=runner.pad_meta, consts=runner._consts)
            for grp in split_uids if grp
        ]
        evaluator = evaluators[0]
    else:
        evaluator = Evaluator(model, data, config, mesh=mesh,
                              pad_meta=runner.pad_meta, consts=runner._consts)
    best = BestResults(patience=config.int("early_stopping"))

    epochs = max_epochs if max_epochs is not None else config.int("training_epochs")
    interval = config.int("interval")
    num_batch_norm = runner.num_train // runner.batch_size + 1  # trainer.py:36 parity
    respects_early_stop = getattr(model, "respects_early_stop", True)

    graph = getattr(model, "graph", None)
    meter = ThroughputMeter(
        num_train=runner.num_train,
        nnz=data.nnz,
        emb_size=config.int("embedding_size"),
        num_layers=getattr(model, "num_layers", 0) or 0,
        steps_per_epoch=runner.num_batches,
        aggregates_per_step=getattr(model, "aggregates_per_step", 1),
        dense_dims=getattr(graph, "padded_shape", None) or (
            tuple(graph.m.shape) if hasattr(graph, "m") else None),
    )

    history: list[dict] = []
    last_result: dict | None = None

    start_epoch = 0
    if checkpoint_dir:
        latest = ckpt.latest_checkpoint(checkpoint_dir)
        if latest is not None:
            template = {"params": params, "opt_state": opt_state, "state": state, "rng": rng}
            tree, meta = ckpt.load_checkpoint(checkpoint_dir, latest, template)
            # loaded leaves are host numpy; re-place them with the
            # template's shardings (runner.shard ran above) rather than
            # leaving placement to jit inference — required for
            # multi-host (numpy can't be implicitly globally placed)
            # and keeps the row-sharded P('model', None) layout explicit
            if mesh is not None:
                from idgrec_tpu.parallel.mesh import global_put

                for part in ("params", "opt_state", "state"):
                    tree[part] = jax.tree.map(
                        lambda leaf, tmpl: global_put(
                            leaf, tmpl.sharding) if hasattr(tmpl, "sharding") else leaf,
                        tree[part], template[part],
                    )
            params, opt_state, state = tree["params"], tree["opt_state"], tree["state"]
            # NOT re-placed: an uncommitted key follows the computation's
            # mesh placement; committing it to the template key's single
            # device would conflict with the mesh-placed state
            rng = jnp.asarray(tree["rng"])
            if "np_rng_state" in meta:
                np_rng.bit_generator.state = meta["np_rng_state"]
            if "best" in meta:
                b = meta["best"]
                best.count = b["count"]
                best.epoch = b["epoch"]
                best.recall = np.asarray(b["recall"]) if b["recall"] is not None else None
                best.ndcg = np.asarray(b["ndcg"]) if b["ndcg"] is not None else None
            start_epoch = meta["epoch"]
            logger.info(f"Resumed from checkpoint at epoch {start_epoch}")

    def place_ctx(ctx):
        """Device placement for the per-epoch context pytree. Under a
        mesh, large 2-D leaves (e.g. SGL's per-epoch dropout adjacency
        matrices) row-shard over 'model' like the main adjacency; small
        leaves (NCL centroids) replicate. Single chip: plain put."""
        if mesh is None:
            return jax.device_put(ctx)
        from idgrec_tpu.parallel.mesh import global_put, param_shardings

        return global_put(ctx, param_shardings(ctx, mesh))

    for epoch in range(start_epoch, epochs):
        start = time.time()
        # epoch_context sees TRUE-shape (unpadded) params/state — NCL's
        # k-means E-step must not cluster zero pad rows
        p_view, s_view = runner.unpad(params, state)
        ctx = place_ctx(model.epoch_context(p_view, s_view, epoch, np_rng))

        rng, sample_key, epoch_key = jax.random.split(rng, 3)
        with maybe_trace(profile_dir if epoch == start_epoch + 1 else None):
            if batching == "bpr_triples":
                users, pos, neg = sampler.sample_epoch(sample_key)
            else:  # user_rows: shuffled user ids; model densifies rows itself
                users = jax.random.permutation(
                    sample_key, jnp.arange(data.num_users, dtype=jnp.int32)
                )
                pos = users
                neg = users
            params, opt_state, state, term_sums = runner.run_epoch(
                params, opt_state, state, ctx, users, pos, neg, epoch_key, epoch
            )
            term_sums = jax.device_get(term_sums)
        elapsed = time.time() - start

        loss_strs = loss_string(term_sums, num_batch_norm)
        logger.info(
            "Epoch: %4d | Training time: %.3f | training loss: %s"
            % (epoch + 1, elapsed, loss_strs)
        )
        logger.event(
            kind="train_epoch", epoch=epoch + 1, seconds=elapsed,
            loss_terms=[float(t) / num_batch_norm for t in term_sums],
            **meter.rates(elapsed),
        )
        history.append({"epoch": epoch + 1, "train_time": elapsed, "loss": loss_strs})

        if epoch % interval == 0:
            rng, eval_key = jax.random.split(rng)
            if sparsity_mode:
                # reference sparsity path (batch_test.py:26-32): log all
                # quartile levels, track best on level 1 — ONE
                # propagation shared across the quartile evaluators
                rep = evaluators[0].compute_repr(params, state, ctx, eval_key)
                results = [
                    ev.evaluate(params, state, ctx, eval_key, eval_repr=rep)
                    for ev in evaluators
                ]
                for level, res in enumerate(results, start=1):
                    logger.info(
                        "\t level_%d: recall: %s ,ndcg: %s"
                        % (level, res["recall"], res["ndcg"])
                    )
                result = last_result = results[0]
            else:
                result = last_result = evaluator.evaluate(params, state, ctx, eval_key)
            best.update(result, epoch)
            logger.info(
                "Epoch: %4d | Test recall: %s | Test NDCG: %s"
                % (epoch + 1, result["recall"], result["ndcg"])
            )
            logger.event(
                kind="eval", epoch=epoch + 1,
                recall=result["recall"], ndcg=result["ndcg"],
                precision=result["precision"],
            )
        # checkpoint cadence is independent of the eval interval:
        # checkpoint_every=None (default) saves at eval epochs; an
        # explicit value saves every N epochs even between evals. Saved
        # AFTER the eval block so the snapshot includes the post-eval
        # RNG state and best-results bookkeeping (resume == straight run).
        if checkpoint_dir and (
            (checkpoint_every is None and epoch % interval == 0)
            or (checkpoint_every is not None and (epoch + 1) % checkpoint_every == 0)
        ):
            # EVERY process calls this (the host-gather of sharded
            # leaves is a collective); only the primary writes
            ckpt.save_checkpoint(
                checkpoint_dir, epoch + 1,
                {"params": params, "opt_state": opt_state, "state": state, "rng": rng},
                np_rng_state=np_rng.bit_generator.state,
                best={
                    "count": best.count, "epoch": best.epoch,
                    "recall": best.recall, "ndcg": best.ndcg,
                },
                write=primary,
            )
        if best.stop and respects_early_stop:
            logger.info("Early stop......")
            break

    if not respects_early_stop:
        # SGL-style final evaluation after the last epoch (SGL.py:196)
        rng, eval_key = jax.random.split(rng)
        p_view, s_view = runner.unpad(params, state)
        ctx = place_ctx(model.epoch_context(p_view, s_view, epochs, np_rng))
        result = last_result = evaluator.evaluate(params, state, ctx, eval_key)
        best.update(result, epochs - 1)

    logger.info("Model training process completed.")
    logger.info(
        "Best epoch: %4d | Best recall: %s | Best NDCG: %s"
        % (best.epoch, best.recall, best.ndcg)
    )
    logger.event(kind="best", epoch=best.epoch, recall=best.recall, ndcg=best.ndcg)
    logger.close()
    # return true-shape (unpadded) state to callers (serving, tests);
    # keep the padded sharded storage visible for sharding assertions
    sharded_params = params if mesh is not None else None
    params, state = runner.unpad(params, state)
    return TrainResult(params=params, state=state, best=best, history=history,
                       last_result=last_result, sharded_params=sharded_params)
