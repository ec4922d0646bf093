"""Cross-implementation parity: this framework vs the actual reference.

Runs the reference's own PyTorch code (mounted read-only at
/root/reference, imported — never copied) on a small synthetic dataset
on CPU, then trains the same models here with the same config, and
compares converged ranking quality. This is the strongest behavioral
oracle available while the reference's benchmark train files are
missing from its snapshot (.MISSING_LARGE_BLOBS): same data, same
hyperparameters, independent implementations, metrics must agree.

RNG streams differ between torch and JAX, so the assertion is on the
converged Recall@20/NDCG@20 values with a tolerance covering seed
noise at this scale (calibrated by running the reference at two seeds).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "models")), reason="reference not mounted"
)

CFG = {
    "dataset_path": "",
    "dataset": "parity",
    "top_K": "[10, 20]",
    "training_epochs": "20",
    "early_stopping": "100",
    "interval": "5",
    "embedding_size": "32",
    "batch_size": "1024",
    "test_batch_size": "256",
    "learn_rate": "0.05",
    "reg_lambda": "0.0001",
    "GCN_layer": "2",
    "sparsity_test": "0",
}


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    from idgrec_tpu.data.dataset import make_synthetic_dataset

    d = tmp_path_factory.mktemp("parity_ds")
    data = make_synthetic_dataset(400, 300, 12_000, 3_000, seed=11, name="parity")
    # write in the reference file format
    for fname, users, items in (
        ("train.txt", data.train_user, data.train_item),
        ("test.txt", data.test_user, data.test_item),
    ):
        by_user: dict[int, list[int]] = {}
        for u, i in zip(users.tolist(), items.tolist()):
            by_user.setdefault(u, []).append(i)
        with open(d / fname, "w") as f:
            for u in sorted(by_user):
                f.write(" ".join([str(u)] + [str(i) for i in by_user[u]]) + "\n")
    return str(d)


# per-model config extras (mirroring configure/<M>.txt keys)
EXTRAS = {
    "MFBPR": {},
    "LightGCN": {},
    "SimGCL": {"epsilon": "0.05", "ssl_lambda": "0.1", "temperature": "0.2"},
    "XSimGCL": {"epsilon": "0.2", "ssl_lambda": "0.1", "temperature": "0.2",
                "cl_layer": "1"},
    "DirectAU": {"gamma": "2.0", "encoder": "MF"},
    "EGCF": {"ssl_lambda": "0.1", "temperature": "0.1", "mode": "parallel"},
}


def _run_reference(dataset_dir: str, model_name: str, seed: int = 2024):
    """Train the reference implementation on CPU; returns final metrics."""
    import importlib
    import torch

    cfg = dict(CFG, **EXTRAS[model_name])
    sys.path.insert(0, REF)
    try:
        from utility.utility_data.data_loader import Data
        from utility.utility_function import tools
        from utility.utility_train import batch_test

        mod = importlib.import_module(f"models.{model_name}")
        RefModel = getattr(mod, model_name)

        tools.set_seed(seed)
        device = torch.device("cpu")
        dataset = Data(dataset_dir, cfg)
        model = RefModel(cfg, dataset, device).to(device)
        optim = torch.optim.Adam(model.parameters(), lr=float(cfg["learn_rate"]))

        for _ in range(int(cfg["training_epochs"])):
            sample = dataset.sample_data_to_train_all()
            users = torch.Tensor(sample[:, 0]).long()
            pos = torch.Tensor(sample[:, 1]).long()
            neg = torch.Tensor(sample[:, 2]).long()
            users, pos, neg = tools.shuffle(users, pos, neg)
            for bu, bp, bn in tools.mini_batch(
                users, pos, neg, batch_size=int(cfg["batch_size"])
            ):
                loss_list = model(bu, bp, bn)
                total = sum(loss_list)
                optim.zero_grad()
                total.backward()
                optim.step()

        result = batch_test.Test(dataset, model, device, cfg)
        return np.asarray(result["recall"]), np.asarray(result["ndcg"])
    finally:
        sys.path.remove(REF)


def _run_ours(dataset_dir: str, model_name: str, seed: int = 2024):
    from idgrec_tpu.config import Config
    from idgrec_tpu.data.dataset import Dataset
    from idgrec_tpu.engine.loop import train_model

    data = Dataset.load(dataset_dir, name="parity")
    res = train_model(
        model_name, data, config=Config(dict(CFG, **EXTRAS[model_name])), seed=seed,
        log_dir=None, echo=False,
    )
    return np.asarray(res.last_result["recall"]), np.asarray(res.last_result["ndcg"])


@pytest.mark.parametrize(
    "model_name", ["MFBPR", "LightGCN", "SimGCL", "XSimGCL", "DirectAU", "EGCF"]
)
def test_converged_metrics_match_reference(dataset_dir, model_name):
    ref_recall, ref_ndcg = _run_reference(dataset_dir, model_name)
    our_recall, our_ndcg = _run_ours(dataset_dir, model_name)
    # tolerance: seed-to-seed spread at this scale is ~5-10% relative;
    # implementations must land in the same band
    for ours, ref, name in (
        (our_recall, ref_recall, "recall"),
        (our_ndcg, ref_ndcg, "ndcg"),
    ):
        np.testing.assert_allclose(
            ours, ref, rtol=0.25, atol=0.01,
            err_msg=f"{model_name} {name}: ours={ours} ref={ref}",
        )
        assert (ours > 0).all()
