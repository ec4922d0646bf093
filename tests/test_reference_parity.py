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

from _ref_harness import install_optional_dep_stubs as _install_optional_dep_stubs

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
    "interval": "4",
    "embedding_size": "32",
    "batch_size": "1024",
    "test_batch_size": "256",
    "learn_rate": "0.05",
    "reg_lambda": "0.0001",
    "GCN_layer": "2",
    "sparsity_test": "0",
    # ours only (reference reads keys lazily; extras are ignored there):
    # full f32 so numerics match the reference bit-for-bit up to op order
    "compute_dtype": "float32",
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
    # weighted-GCN family: the reference CRASHES with mess_dropout=False
    # (self.mess_dropout only set under the flag but used unconditionally,
    # GCMC.py:45-46,86) — so dropout stays on with its shipped probability
    "GCMC": {"mess_dropout": "True", "mess_drop_prob": "[0.1, 0.1]",
             "layer_size": "[32, 32]"},
    "GCCF": {"mess_dropout": "True", "mess_drop_prob": "[0.1, 0.1]",
             "node_dropout": "False", "node_drop_prob": "0.1",
             "layer_size": "[32, 32]"},
    "NGCF": {"mess_dropout": "True", "mess_drop_prob": "[0.1, 0.1]",
             "node_dropout": "False", "node_drop_prob": "0.1",
             "layer_size": "[32, 32]"},
    "IMPGCN": {"group": "2"},
    # HCCF explodes at lr=0.05 on tiny data in BOTH implementations
    # (the hyper branch is cubic in the embeddings); compare at a
    # stable learning rate
    "HCCF": {"hyper_size": "32", "ssl_lambda": "0.1", "temperature": "0.1",
             "keeprate": "1.0", "learn_rate": "0.005"},
    "LightGCL": {"ssl_lambda": "0.5", "temperature": "0.2", "svd_q": "5"},
    "CGCL": {"ssl_lambda_alpha": "1e-5", "ssl_lambda_beta": "1e-5",
             "ssl_lambda_gamma": "1e-5", "alpha": "0.5", "beta": "0.5",
             "gamma": "0.5", "temperature": "0.1"},
    "MAWU": {"gamma_user": "1.0", "gamma_item": "0.1", "encoder": "LightGCN"},
    "RecDCL": {"a": "1", "polyc": "1e-7", "degree": "4", "all_bt_coeff": "1",
               "poly_coeff": "5.0", "bt_coeff": "0.01", "mom_coeff": "1",
               "momentum": "0.1"},
    "BIGCF": {"ssl_lambda": "0.2", "ssl_temperature": "0.2",
              "int_temperature": "0.2", "intent_size": "32"},
    "SCCF": {"temperature": "0.1", "encoder": "MF"},
    "LightGCN_pp": {"gamma": "0.2", "alpha": "0.6", "beta": "-0.1"},
    "LightCCF": {"ssl_lambda": "5.0", "temperature": "0.22", "encoder": "LightGCN"},
    "LightCSCF": {"lambda_reg": "0.0001", "lambda_gamma": "1.0",
                  "lambda_margin": "0.7", "temperature": "0.2",
                  "encoder": "LightGCN"},
    "SGL": {"ssl_lambda": "0.1", "ssl_ratio": "0.1", "aug_type": "ed",
            "temperature": "0.2"},
    # k scaled to the 400-user dataset (shipped k=2000 exceeds the
    # point count); 24 epochs so the hardcoded epoch>=20 E-step +
    # proto loss (NCL.py:110-112,177) actually runs on both sides
    "NCL": {"ssl_lambda": "1e-6", "proto_lambda": "1e-7",
            "temperature": "0.05", "cl_layer": "1", "alpha": "1.5",
            "k": "8", "training_epochs": "24"},
    "MixRec": {"ssl_lambda": "1.1", "temperature": "0.2", "alpha": "0.1",
               "beta": "0.1", "gamma": "0.1"},
    "LightGODE": {"gamma": "2.0", "t": "4.0", "train_strategy": "MF_init"},
    "CVGA": {"dropout": "0.3"},
}

# custom-trainer models are covered by their own harness functions
# below: SGL (per-epoch subgraph rebuilds, SGL.py:115-197) by
# test_sgl_converged_metrics_match_reference, CVGA (user-row batches,
# CVGA.py:101-170) by test_cvga_converged_metrics_match_reference.
# NCL's deviations (E_step at epoch>=20, epoch-conditional loss arity,
# NCL.py:163-234) are handled inline in _run_reference.


def _run_reference(dataset_dir: str, model_name: str, seed: int = 2024):
    """Train the reference implementation on CPU; returns final metrics."""
    import importlib
    import torch

    cfg = dict(CFG, **EXTRAS[model_name])
    _install_optional_dep_stubs()
    sys.path.insert(0, REF)
    # MixRec hardcodes `.cuda()` on its shuffle permutations
    # (MixRec.py:74-75,109-110) — a GPU-only reference bug (SURVEY
    # §7.3.7); neutralize it for the CPU parity run
    orig_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
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

        # track the best eval like the reference engine does
        # (batch_test.general_test best-results bookkeeping)
        best_recall = np.zeros(2)
        best_ndcg = np.zeros(2)
        for epoch in range(int(cfg["training_epochs"])):
            # NCL's trainer runs the k-means E-step each epoch >= 20
            # (hardcoded, NCL.py:177-178) before entering train mode
            if model_name == "NCL" and epoch >= 20:
                model.E_step()
            # the reference trainer re-enters train mode EVERY epoch
            # (trainer.py:24) — without this, batch_test.Test's
            # model.eval() leaves BN/dropout in eval mode for all
            # subsequent training epochs, which is NOT the reference's
            # real training behavior
            model.train()
            sample = dataset.sample_data_to_train_all()
            users = torch.Tensor(sample[:, 0]).long()
            pos = torch.Tensor(sample[:, 1]).long()
            neg = torch.Tensor(sample[:, 2]).long()
            users, pos, neg = tools.shuffle(users, pos, neg)
            for bu, bp, bn in tools.mini_batch(
                users, pos, neg, batch_size=int(cfg["batch_size"])
            ):
                # NCL's forward takes the epoch (conditional proto-loss
                # arity, NCL.py:110-112,184)
                if model_name == "NCL":
                    loss_list = model(bu, bp, bn, epoch)
                else:
                    loss_list = model(bu, bp, bn)
                total = sum(loss_list)
                optim.zero_grad()
                total.backward()
                optim.step()
            if epoch % int(cfg["interval"]) == 0:
                r = batch_test.Test(dataset, model, device, cfg)
                if r["recall"][0] > best_recall[0]:
                    best_recall = np.asarray(r["recall"])
                    best_ndcg = np.asarray(r["ndcg"])

        result = batch_test.Test(dataset, model, device, cfg)
        if result["recall"][0] > best_recall[0]:
            best_recall = np.asarray(result["recall"])
            best_ndcg = np.asarray(result["ndcg"])
        return best_recall, best_ndcg
    finally:
        torch.Tensor.cuda = orig_cuda
        sys.path.remove(REF)


def _run_ours(dataset_dir: str, model_name: str, seed: int = 2024,
              overrides: dict | None = None):
    from idgrec_tpu.config import Config
    from idgrec_tpu.data.dataset import Dataset
    from idgrec_tpu.engine.loop import train_model

    data = Dataset.load(dataset_dir, name="parity")
    cfg = dict(CFG, **EXTRAS[model_name])
    cfg.update(overrides or {})
    res = train_model(
        model_name, data, config=Config(cfg), seed=seed,
        log_dir=None, echo=False,
    )
    return np.asarray(res.best.recall), np.asarray(res.best.ndcg)


# trajectory comparison is only meaningful where tiny-data training is
# STABLE; lockstep experiments showed both implementations track each
# other exactly (identical forward losses and eval metrics on shared
# weights — see test_reference_exact.py, which covers all 20 runnable
# models deterministically), while chaotic-regime best-epoch metrics
# vary ±40% with the RNG stream on both sides.
@pytest.mark.parametrize(
    "model_name",
    [
        "MFBPR", "LightGCN", "SimGCL", "XSimGCL", "DirectAU", "EGCF",
        # SSL family (VERDICT round-1 item 7) — all stable at this
        # scale with their EXTRAS rates
        "HCCF", "LightGCL", "CGCL", "SCCF", "LightCCF", "LightCSCF",
        # BN-projector model: comparable once the harness re-enters
        # train mode per epoch exactly like the reference trainer
        # (trainer.py:24) — see the model.train() note in _run_reference
        "RecDCL",
        # optional-dep / GPU-bug models, runnable via the harness's
        # faithful stand-ins (_ref_harness.install_optional_dep_stubs +
        # the torch.Tensor.cuda patch). LightGODE is NOT here: converged
        # align/uniform training saturates the reference's own
        # post-sigmoid eval (see test_lightgode_eval_saturation_artifact)
        # so band comparison is structurally unfair in our favor; its
        # math parity lives in test_reference_exact.py instead.
        "NCL", "MixRec",
        # intent-disentangled SSL (gaussian noise in forward -> band
        # comparison like the other stochastic models)
        "BIGCF",
    ],
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


def _run_reference_sgl(dataset_dir: str, seed: int = 2024, aug_type: str = "ed"):
    """Replicates the reference's custom SGL trainer (SGL.py:115-197):
    two fresh augmented subgraphs per epoch ('ed': one shared graph per
    view, SGL.py:130-135; 'rw': an independent graph PER LAYER per view,
    SGL.py:136-143), interval evals that never early-stop, and a final
    post-training evaluation."""
    import importlib
    import torch

    cfg = dict(CFG, **EXTRAS["SGL"])
    cfg["aug_type"] = aug_type
    sys.path.insert(0, REF)
    try:
        from utility.utility_data.data_loader import Data
        from utility.utility_function import tools
        from utility.utility_train import batch_test

        mod = importlib.import_module("models.SGL")
        RefModel = mod.SGL

        tools.set_seed(seed)
        device = torch.device("cpu")
        dataset = Data(dataset_dir, cfg)
        model = RefModel(cfg, dataset, device).to(device)
        optim = torch.optim.Adam(model.parameters(), lr=float(cfg["learn_rate"]))
        ssl_ratio = float(cfg["ssl_ratio"])

        def one_subgraph():
            g = tools.create_adj_mat(dataset.user_item_net, cfg["aug_type"], ssl_ratio)
            return tools.convert_sp_mat_to_sp_tensor(g).to(device)

        def make_subgraph():
            if cfg["aug_type"] == "rw":  # per-layer list, SGL.py:136-143
                return [one_subgraph() for _ in range(int(cfg["GCN_layer"]))]
            return one_subgraph()

        best_recall = np.zeros(2)
        best_ndcg = np.zeros(2)
        for epoch in range(int(cfg["training_epochs"])):
            model.train()  # SGL.py:145 re-enters train mode per epoch
            g1, g2 = make_subgraph(), make_subgraph()
            sample = dataset.sample_data_to_train_all()
            users = torch.Tensor(sample[:, 0]).long()
            pos = torch.Tensor(sample[:, 1]).long()
            neg = torch.Tensor(sample[:, 2]).long()
            users, pos, neg = tools.shuffle(users, pos, neg)
            for bu, bp, bn in tools.mini_batch(
                users, pos, neg, batch_size=int(cfg["batch_size"])
            ):
                loss_list = model(bu, bp, bn, g1, g2)
                total = sum(loss_list)
                optim.zero_grad()
                total.backward()
                optim.step()
            if epoch % int(cfg["interval"]) == 0:
                r = batch_test.Test(dataset, model, device, cfg)
                if r["recall"][0] > best_recall[0]:
                    best_recall = np.asarray(r["recall"])
                    best_ndcg = np.asarray(r["ndcg"])

        result = batch_test.Test(dataset, model, device, cfg)
        if result["recall"][0] > best_recall[0]:
            best_recall = np.asarray(result["recall"])
            best_ndcg = np.asarray(result["ndcg"])
        return best_recall, best_ndcg
    finally:
        sys.path.remove(REF)


@pytest.mark.parametrize("aug_type", ["ed", "rw"])
def test_sgl_converged_metrics_match_reference(dataset_dir, aug_type):
    """SGL parity despite its custom trainer, for BOTH augmentation
    modes (shared edge-dropout graph vs per-layer random-walk lists):
    per-epoch subgraph RNG diverges between the stacks, so this pins
    the same converged band as the universal-trainer matrix."""
    ref_recall, ref_ndcg = _run_reference_sgl(dataset_dir, aug_type=aug_type)
    our_recall, our_ndcg = _run_ours(
        dataset_dir, "SGL", overrides={"aug_type": aug_type})
    for ours, ref, name in (
        (our_recall, ref_recall, "recall"),
        (our_ndcg, ref_ndcg, "ndcg"),
    ):
        np.testing.assert_allclose(
            ours, ref, rtol=0.25, atol=0.01,
            err_msg=f"SGL {name}: ours={ours} ref={ref}",
        )
        assert (ours > 0).all()


def _run_reference_cvga(dataset_dir: str, seed: int = 2024):
    """CVGA's custom trainer (CVGA.py:101-170): batches over USER ROWS
    of the interaction matrix (densified per batch), not BPR triples —
    the user permutation is drawn once, BEFORE the epoch loop."""
    import importlib
    import torch

    cfg = dict(CFG, **EXTRAS["CVGA"])
    sys.path.insert(0, REF)
    try:
        from utility.utility_data.data_loader import Data
        from utility.utility_function import tools
        from utility.utility_train import batch_test

        mod = importlib.import_module("models.CVGA")
        RefModel = mod.CVGA

        tools.set_seed(seed)
        device = torch.device("cpu")
        dataset = Data(dataset_dir, cfg)
        model = RefModel(cfg, dataset, device).to(device)
        optim = torch.optim.Adam(model.parameters(), lr=float(cfg["learn_rate"]))

        user_list = list(range(dataset.num_users))
        np.random.shuffle(user_list)  # once, CVGA.py:106-107
        train_data = dataset.user_item_net
        bs = int(cfg["batch_size"])

        best_recall = np.zeros(2)
        best_ndcg = np.zeros(2)
        for epoch in range(int(cfg["training_epochs"])):
            model.train()
            for start in range(0, dataset.num_users, bs):
                end = min(start + bs, dataset.num_users)
                rows = user_list[start:end]
                users = torch.Tensor(rows).long().to(device)
                dense = torch.FloatTensor(train_data[rows].toarray()).to(device)
                loss_list = model(users, dense)
                total = sum(loss_list)
                optim.zero_grad()
                total.backward()
                optim.step()
            if epoch % int(cfg["interval"]) == 0:
                r = batch_test.Test(dataset, model, device, cfg)
                if r["recall"][0] > best_recall[0]:
                    best_recall = np.asarray(r["recall"])
                    best_ndcg = np.asarray(r["ndcg"])

        result = batch_test.Test(dataset, model, device, cfg)
        if result["recall"][0] > best_recall[0]:
            best_recall = np.asarray(result["recall"])
            best_ndcg = np.asarray(result["ndcg"])
        return best_recall, best_ndcg
    finally:
        sys.path.remove(REF)


def test_cvga_converged_metrics_match_reference(dataset_dir):
    """CVGA parity despite its custom trainer: the VAE's
    reparameterization noise streams differ between the stacks, so this
    pins the same converged band as the universal-trainer matrix."""
    ref_recall, ref_ndcg = _run_reference_cvga(dataset_dir)
    our_recall, our_ndcg = _run_ours(dataset_dir, "CVGA")
    for ours, ref, name in (
        (our_recall, ref_recall, "recall"),
        (our_ndcg, ref_ndcg, "ndcg"),
    ):
        np.testing.assert_allclose(
            ours, ref, rtol=0.25, atol=0.01,
            err_msg=f"CVGA {name}: ours={ours} ref={ref}",
        )
        assert (ours > 0).all()


def test_lightgode_eval_saturation_artifact(dataset_dir):
    """Why LightGODE is excluded from the converged-band matrix, pinned
    as a test. Align/uniform training grows embedding norms without
    bound; after a few epochs a large fraction of the reference's
    eval scores `sigmoid(U @ I^T)` saturate to EXACTLY 1.0 in f32, and
    its `torch.topk` over post-sigmoid ratings (batch_test.py:59-68)
    then tie-breaks by item index — destroying the model's own ranking.
    This framework ranks raw scores (sigmoid is monotonic; masking is
    below-floor, per SURVEY §7.3.3), so on IDENTICAL weights it scores
    at least as well. Asserted here:

    1. raw score parity: both stacks produce the same sigmoid matrix;
    2. the saturation is real (a material fraction of scores == 1.0);
    3. our evaluator's recall on the reference-trained weights is >=
       the reference's own (the artifact only ever hurts the reference).
    """
    import importlib

    import jax
    import jax.numpy as jnp
    import torch

    from idgrec_tpu.config import Config
    from idgrec_tpu.data.dataset import Dataset
    from idgrec_tpu.engine.evaluator import Evaluator
    from idgrec_tpu.models import get_model

    cfg = dict(CFG, **EXTRAS["LightGODE"])
    _install_optional_dep_stubs()
    sys.path.insert(0, REF)
    try:
        from utility.utility_data.data_loader import Data
        from utility.utility_function import tools
        from utility.utility_train import batch_test

        tools.set_seed(2024)
        device = torch.device("cpu")
        dataset = Data(dataset_dir, cfg)
        mod = importlib.import_module("models.LightGODE")
        ref = mod.LightGODE(cfg, dataset, device).to(device)
        optim = torch.optim.Adam(ref.parameters(), lr=float(cfg["learn_rate"]))
        for _ in range(6):  # norms grow fast; 6 epochs saturate plenty
            ref.train()
            sample = dataset.sample_data_to_train_all()
            u = torch.Tensor(sample[:, 0]).long()
            p = torch.Tensor(sample[:, 1]).long()
            n = torch.Tensor(sample[:, 2]).long()
            u, p, n = tools.shuffle(u, p, n)
            for bu, bp, bn in tools.mini_batch(
                u, p, n, batch_size=int(cfg["batch_size"])
            ):
                total = sum(ref(bu, bp, bn))
                optim.zero_grad()
                total.backward()
                optim.step()

        ref.eval()
        probe = torch.arange(32).long()
        ref_rating = ref.get_rating_for_test(probe).detach().numpy()
        r_ref = batch_test.Test(dataset, ref, device, cfg)

        data = Dataset.load(dataset_dir, name="parity")
        ours = get_model("LightGODE")(Config(cfg), data)
        params = ours.init_params(jax.random.PRNGKey(0))
        params["user_emb"] = jnp.array(np.array(
            ref.encoder.user_embedding.weight.detach().numpy(), copy=True))
        params["item_emb"] = jnp.array(np.array(
            ref.encoder.item_embedding.weight.detach().numpy(), copy=True))

        # 1. identical raw sigmoid scores on identical weights
        ue, ie = ours.eval_embeddings(params, {}, (), jax.random.PRNGKey(1))
        our_rating = np.asarray(jax.nn.sigmoid(ue[:32] @ ie.T))
        np.testing.assert_allclose(our_rating, ref_rating, atol=2e-5)

        # 2. the reference's scores really saturate (measured 21% of the
        # full matrix at 8 epochs; require a material fraction here)
        assert (ref_rating == 1.0).mean() > 0.03, (
            f"expected saturation, frac={float((ref_rating == 1.0).mean())}")

        # 3. ranking raw scores can only match or beat index-tie-broken
        # saturated scores
        ev = Evaluator(ours, data, Config(cfg))
        r_our = ev.evaluate(params, {}, (), jax.random.PRNGKey(2))
        assert float(r_our["recall"][0]) >= float(r_ref["recall"][0]) - 1e-6, (
            f"ours={r_our['recall']} ref={r_ref['recall']}")
    finally:
        sys.path.remove(REF)
