"""Decompose the bench epoch: sampler / prepare / segment scan / sync.

The committed step cost table covers the jitted step; this script
measures the per-EPOCH orchestration around it at bench configuration
(LightGCN int4, B=2048, yelp2018 scale) so the gap between
605 x step_ms and the measured epoch wall time is attributed.

Usage: python scripts/profile_epoch.py [--segments N]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idgrec_tpu.compile_cache import enable as _enable_cache

_enable_cache()

import jax
import jax.numpy as jnp

from idgrec_tpu.config import Config
from idgrec_tpu.data.dataset import make_synthetic_dataset
from idgrec_tpu.engine.sampler import NegativeSampler
from idgrec_tpu.engine.trainer import EpochRunner
from idgrec_tpu.models.registry import get_model


def timed(name, fn, n=5):
    fn()  # compile
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s} {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-steps-per-call", type=int, default=256)
    args = ap.parse_args()

    data = make_synthetic_dataset(31668, 38048, 1237259, 1000, seed=0,
                                  name="yelp2018-scale")
    cfg = Config({
        "dataset": data.name, "top_K": "[10, 20]", "embedding_size": "64",
        "batch_size": "2048", "test_batch_size": "2048",
        "learn_rate": "0.001", "reg_lambda": "0.0001", "GCN_layer": "3",
        "propagation_backend": "fused", "compute_dtype": "int4",
    })
    model = get_model("LightGCN")(cfg, data)
    model.device_put()
    rng = jax.random.PRNGKey(2024)
    rng, p_rng = jax.random.split(rng)
    params = model.init_params(p_rng)
    state = model.init_state(p_rng)
    runner = EpochRunner(model, 0.001, 2048, data.num_train,
                         max_steps_per_call=args.max_steps_per_call)
    opt_state = runner.init_opt_state(params)
    sampler = NegativeSampler(data)
    print(f"segments: {runner.segment_lengths}", flush=True)

    k1 = jax.random.PRNGKey(7)
    # sync through ONE jitted reducer (un-jitted tiny-op dispatches have
    # wedged the axon tunnel; a single cached program is safe)
    _sum = jax.jit(lambda t: jnp.sum(jnp.asarray(t, jnp.float32).ravel()[:8]))

    def run_sampler():
        u, p, n = sampler.sample_epoch(k1)
        # axon tunnel: block_until_ready does not wait for remote
        # execution — fetch a scalar instead
        float(_sum(n))
        return u, p, n

    t_sample = timed("sampler.sample_epoch", run_sampler)
    users, pos, neg = sampler.sample_epoch(k1)
    jax.block_until_ready(neg)

    def run_prepare():
        b = runner._prepare(users, pos, neg)
        float(_sum(b["neg"]))
        return b

    t_prepare = timed("prepare (tile+reshape)", run_prepare)
    batches = runner._shard_batches(runner._prepare(users, pos, neg))

    # one full segment scan (the jitted core), non-donated timing copy
    seg_len = runner.segment_lengths[0]
    seg = jax.tree.map(lambda a: jax.lax.slice_in_dim(a, 0, seg_len, axis=0),
                       batches)

    ep = jnp.asarray(0, jnp.int32)

    def run_segment():
        p2, o2, s2, r2, terms = runner._segment(
            jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, opt_state),
            jax.tree.map(jnp.copy, state),
            (), seg, rng, ep, runner._consts)
        float(_sum(terms))

    t_seg = timed(f"segment scan ({seg_len} st)", run_segment, n=3)
    print(f"  -> {t_seg/seg_len*1e3:9.3f} ms/step inside scan", flush=True)

    def run_epoch():
        u, p, n = sampler.sample_epoch(k1)
        p2, o2, s2, terms = runner.run_epoch(
            jax.tree.map(jnp.copy, params),
            jax.tree.map(jnp.copy, opt_state),
            jax.tree.map(jnp.copy, state), (), u, p, n, rng, 0)
        float(_sum(terms))

    t_epoch = timed("full epoch", run_epoch, n=3)
    n_steps = runner.num_batches
    print(f"  -> {t_epoch/n_steps*1e3:9.3f} ms/step incl. orchestration",
          flush=True)
    print(f"epoch-overhead vs scan: "
          f"{(t_epoch - t_seg*n_steps/seg_len)*1e3:9.1f} ms/epoch "
          f"(sampler {t_sample*1e3:.0f} + prepare {t_prepare*1e3:.0f})",
        flush=True)


if __name__ == "__main__":
    main()
