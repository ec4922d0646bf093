"""Attribute the LightGCN int4 step's non-propagation time (real TPU).

The committed cost table bounds it as step(7.4-7.7) - chain fwd+bwd
(6.1) ~ 1.3-1.6 ms/step; this script splits that into:
  chain fwd+bwd           (baseline, tune_tkernel_tiles.py measures too)
  + loss heads & gathers  grad of (bpr + reg) through the chain
  + Adam                  optax update + apply
by timing three nested jitted functions on the shipping configuration.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from idgrec_tpu.compile_cache import enable as _enable_cache

_enable_cache()

import numpy as np
import jax
import jax.numpy as jnp
import optax

from idgrec_tpu.config import Config
from idgrec_tpu.data.dataset import make_synthetic_dataset
from idgrec_tpu.models.registry import get_model

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from profile_step import chain_time  # noqa: E402

data = make_synthetic_dataset(31668, 38048, 1237259, 1000, seed=0,
                              name="yelp2018-scale")
cfg = Config({
    "dataset": data.name, "top_K": "[10, 20]", "embedding_size": "64",
    "batch_size": "2048", "test_batch_size": "2048", "learn_rate": "0.001",
    "reg_lambda": "0.0001", "GCN_layer": "3",
    "propagation_backend": "fused", "compute_dtype": "int4",
})
model = get_model("LightGCN")(cfg, data)
model.device_put()
rng = jax.random.PRNGKey(2024)
params = model.init_params(rng)
opt = optax.adam(0.001, b1=0.9, b2=0.999, eps=1e-8)
opt_state = opt.init(params)
consts = model.constants()

B = 2048
rb = np.random.default_rng(0)
batch = {
    "user": jnp.asarray(rb.integers(0, data.num_users, B), jnp.int32),
    "pos": jnp.asarray(rb.integers(0, data.num_items, B), jnp.int32),
    "neg": jnp.asarray(rb.integers(0, data.num_items, B), jnp.int32),
}
key = jax.random.PRNGKey(1)
ep = jnp.asarray(0, jnp.int32)


def loss_fn(p, consts_):
    with model.bound_constants(consts_):
        terms, _ = model.loss_terms(p, (), (), batch, key, ep)
    t = jnp.asarray(0.0, jnp.float32)
    for x in terms:
        t = t + x
    return t


def chain_only(u, i, consts_):
    def f(pp):
        with model.bound_constants(consts_):
            ua, ia = model.propagate(pp)
        return jnp.sum(ua ** 2) + jnp.sum(ia ** 2)

    g = jax.grad(f)({"user_emb": u, "item_emb": i})
    return g["user_emb"], g["item_emb"]


def grad_loss(u, i, consts_):
    p = {"user_emb": u, "item_emb": i}
    g = jax.grad(loss_fn)(p, consts_)
    return g["user_emb"], g["item_emb"]


def full_step(u, i, consts_, opt_state_):
    p = {"user_emb": u, "item_emb": i}
    g = jax.grad(loss_fn)(p, consts_)
    upd, _ = opt.update(g, opt_state_, p)
    p2 = optax.apply_updates(p, upd)
    return p2["user_emb"], p2["item_emb"]


def chain_gather(u, i, consts_):
    """chain + batch gather + scatter-add backward, no loss math —
    isolates the gather/scatter/layout share of grad(loss)."""
    def f(pp):
        with model.bound_constants(consts_):
            ua, ia = model.propagate(pp)
        return (jnp.sum(ua[batch["user"]]) + jnp.sum(ia[batch["pos"]])
                + jnp.sum(ia[batch["neg"]]))

    g = jax.grad(f)({"user_emb": u, "item_emb": i})
    return g["user_emb"], g["item_emb"]


def ego_loss_only(u, i, consts_):
    """loss heads on the EGO embeddings (no propagation chain) —
    isolates the BPR + reg + Adam-free loss-head cost."""
    def f(pp):
        from idgrec_tpu.ops import losses as L
        ue = pp["user_emb"][batch["user"]]
        pe = pp["item_emb"][batch["pos"]]
        ne = pp["item_emb"][batch["neg"]]
        return L.bpr_loss(ue, pe, ne) + 1e-4 * L.reg_loss(ue, pe, ne)

    g = jax.grad(f)({"user_emb": u, "item_emb": i})
    return g["user_emb"], g["item_emb"]


u0 = params["user_emb"]
i0 = params["item_emb"]
z = jnp.zeros_like
results = {}
results["chain.fwd+bwd(sum)"] = chain_time(
    "chain.fwd+bwd(sum)", chain_only, u0, i0, statics=(consts,))
results["chain+gather"] = chain_time(
    "chain+gather", chain_gather, u0, i0, statics=(consts,))
results["ego-loss-only"] = chain_time(
    "ego-loss-only", ego_loss_only, u0, i0, statics=(consts,))
results["grad(loss)"] = chain_time(
    "grad(loss)", grad_loss, u0, i0, statics=(consts,))
results["grad+adam"] = chain_time(
    "grad+adam", full_step, u0, i0, statics=(consts, opt_state))
table = {k: round(v * 1e3, 3) for k, v in results.items()}
print(table)
ap = argparse.ArgumentParser()
ap.add_argument("--out", default=None)
args, _ = ap.parse_known_args()
if args.out:
    with open(args.out, "w") as f:
        json.dump({
            "script": "scripts/profile_step_other.py",
            "units": "ms per step component (LightGCN int4, shipping "
                     "configuration, real v5e)",
            "table": table,
        }, f, indent=1)
    print(f"wrote {args.out}")
