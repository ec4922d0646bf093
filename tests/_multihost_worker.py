"""One process of a local `jax.distributed` CPU cluster (test_multihost).

Runs the FULL engine path (train_model with a mesh) under
`process_count() > 1`, which exercises the multi-process placement
layer (parallel/mesh.py `global_put`): every host feeds only its
addressable shards of params / optimizer state / batches / ctx, the
design the reference cannot express at all (single process, single
GPU — SURVEY §5 "Distributed communication backend").

Usage: python tests/_multihost_worker.py <coordinator> <num_processes>
           <process_id> <local_device_count> <out_json>

The primary process writes the loss trajectory + best recall to
<out_json>; non-primary processes run the same compute silently.
"""

import json
import os
import sys


def main():
    coord = sys.argv[1]
    nproc = int(sys.argv[2])
    pid = int(sys.argv[3])
    local_devices = int(sys.argv[4])
    out_path = sys.argv[5]

    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        from jax.extend.backend import clear_backends

        clear_backends()
    except Exception:
        pass

    from idgrec_tpu.parallel import distributed

    if nproc > 1:
        distributed.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * local_devices

    import numpy as np

    from idgrec_tpu.config import Config
    from idgrec_tpu.data.dataset import make_synthetic_dataset
    from idgrec_tpu.engine.loop import train_model
    from idgrec_tpu.parallel.mesh import make_mesh

    data = make_synthetic_dataset(64, 64, 1024, 128, seed=9, name="tiny")
    cfg = Config({
        "dataset": "tiny", "top_K": "[3, 5]", "training_epochs": "2",
        "early_stopping": "10", "interval": "1", "embedding_size": "16",
        "batch_size": "64", "test_batch_size": "32", "learn_rate": "0.01",
        "reg_lambda": "0.0001", "GCN_layer": "2",
    })
    mesh = make_mesh(4, data_parallel=2)  # 2x2 regardless of process count
    res = train_model(
        "LightGCN", data, config=cfg, seed=3, log_dir=None, echo=False, mesh=mesh
    )

    # NCL leg: its k-means epoch context is DERIVED from the sharded
    # params (global, non-fully-addressable arrays), exercising
    # global_put's on-device reshard branch — LightGCN's empty ctx
    # never would
    ncl_cfg = Config({
        **dict(cfg.items()),
        "ssl_lambda": "1e-6", "proto_lambda": "1e-7", "temperature": "0.05",
        "cl_layer": "1", "alpha": "1.5", "k": "4", "warmup_epochs": "1",
    })
    ncl = train_model(
        "NCL", data, config=ncl_cfg, seed=3, log_dir=None, echo=False, mesh=mesh
    )

    # checkpoint leg: the host-gather in save_checkpoint is a collective
    # (process_allgather of non-addressable leaves) — every process
    # calls it, only the primary writes; resume re-places the loaded
    # host arrays with the template's mesh shardings via global_put
    ck_dir = out_path + ".ck"
    train_model("LightGCN", data, config=Config({**dict(cfg.items()),
                                                 "training_epochs": "1"}),
                seed=3, log_dir=None, echo=False, mesh=mesh,
                checkpoint_dir=ck_dir, checkpoint_every=1)
    resumed = train_model("LightGCN", data, config=cfg, seed=3, log_dir=None,
                          echo=False, mesh=mesh,
                          checkpoint_dir=ck_dir, checkpoint_every=1)

    if distributed.is_primary():
        payload = {
            "losses": [float(h["loss"].split(" = ")[0]) for h in res.history],
            "recall": np.asarray(res.best.recall, np.float64).tolist(),
            "ndcg": np.asarray(res.best.ndcg, np.float64).tolist(),
            "ncl_losses": [float(h["loss"].split(" = ")[0]) for h in ncl.history],
            "resumed_losses": [float(h["loss"].split(" = ")[0]) for h in resumed.history],
            "resumed_recall": np.asarray(resumed.best.recall, np.float64).tolist(),
            "process_count": jax.process_count(),
        }
        with open(out_path, "w") as f:
            json.dump(payload, f)


if __name__ == "__main__":
    main()
