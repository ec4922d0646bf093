"""ID-GRec-TPU: a TPU-native graph recommendation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
ID-GRec framework (PyTorch, single GPU): ID-based graph collaborative
filtering with a 25-model zoo (MF-BPR .. LightGCN .. the graph-SSL family),
a universal trainer, full-catalog top-K evaluation, and a text-file config
system — rebuilt for TPU hardware:

* embedding propagation (normalized-adjacency SpMM) as gather/segment-sum
  with a custom VJP, optionally as a Pallas TPU kernel;
* one jitted `lax.scan` per training epoch (no per-step host round-trips);
* on-device vectorized BPR negative sampling;
* sharded multi-chip execution over a `jax.sharding.Mesh`
  (data-parallel batches, row-sharded embedding tables, edge-partitioned
  propagation with ICI collectives);
* on-device full-catalog evaluation (masked top-k + metric reductions).

Reference behavior citations use ``file:line`` into the upstream repo
(mounted read-only at /root/reference) and are for parity checking only.
"""

__version__ = "0.1.0"

from idgrec_tpu.config import Config, load_model_config, read_configuration


def __getattr__(name):  # lazy: avoid importing jax-heavy modules eagerly
    if name == "train_model":
        from idgrec_tpu.engine.loop import train_model
        return train_model
    if name == "Dataset":
        from idgrec_tpu.data.dataset import Dataset
        return Dataset
    if name == "Recommender":
        from idgrec_tpu.serving import Recommender
        return Recommender
    raise AttributeError(name)


__all__ = [
    "Config",
    "Dataset",
    "Recommender",
    "load_model_config",
    "read_configuration",
    "train_model",
    "__version__",
]
