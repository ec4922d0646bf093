import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.config import Config
from idgrec_tpu.data.dataset import make_synthetic_dataset
from idgrec_tpu.engine.loop import train_model
from idgrec_tpu.engine.sampler import NegativeSampler


def _cfg(**over):
    base = {
        "dataset": "tiny",
        "top_K": "[3, 5]",
        "training_epochs": "3",
        "early_stopping": "10",
        "interval": "1",
        "embedding_size": "16",
        "batch_size": "64",
        "test_batch_size": "32",
        "learn_rate": "0.05",
        "reg_lambda": "0.0001",
        "GCN_layer": "2",
    }
    base.update({k: str(v) for k, v in over.items()})
    return Config(base)


def _data(seed=0):
    return make_synthetic_dataset(60, 90, 1200, 240, seed=seed, name="tiny")


def test_negative_sampler_avoids_positives():
    data = _data()
    sampler = NegativeSampler(data)
    users, pos, neg = sampler.sample_epoch(jax.random.PRNGKey(0))
    users, pos, neg = map(np.asarray, (users, pos, neg))
    assert users.shape == (data.num_train,)
    # every positive must be a real interaction of that user
    for u, p in zip(users[:200], pos[:200]):
        assert p in data.positive_items(u)
    # negatives never collide with positives
    collisions = sum(
        1 for u, n in zip(users, neg) if n in set(data.positive_items(u).tolist())
    )
    assert collisions == 0
    # negatives roughly uniform over items
    assert len(np.unique(neg)) > data.num_items * 0.5


def test_sampler_epochs_differ():
    data = _data()
    sampler = NegativeSampler(data)
    _, _, n1 = sampler.sample_epoch(jax.random.PRNGKey(1))
    _, _, n2 = sampler.sample_epoch(jax.random.PRNGKey(2))
    assert not np.array_equal(np.asarray(n1), np.asarray(n2))


def test_mfbpr_end_to_end_loss_decreases():
    data = _data()
    result = train_model("MFBPR", data, config=_cfg(), seed=7, log_dir=None, echo=False, max_epochs=5)
    losses = [h["loss"] for h in result.history]
    first = float(losses[0].split(" = ")[0])
    last = float(losses[-1].split(" = ")[0])
    assert last < first
    assert result.best.recall is not None
    assert result.best.recall.shape == (2,)


def test_lightgcn_end_to_end():
    data = _data(seed=3)
    result = train_model("LightGCN", data, config=_cfg(), seed=7, log_dir=None, echo=False, max_epochs=4)
    first = float(result.history[0]["loss"].split(" = ")[0])
    last = float(result.history[-1]["loss"].split(" = ")[0])
    assert last < first
    assert 0.0 <= result.best.recall[0] <= 1.0
    assert 0.0 <= result.best.ndcg[1] <= 1.0


def test_lightgcn_learns_better_than_random():
    """On an easy structured dataset, recall after training must beat the
    random-ranking baseline by a wide margin."""
    rng = np.random.default_rng(0)
    # block structure: users like items in their own cluster
    n_clusters, users_per, items_per = 4, 20, 25
    tu, ti, su, si = [], [], [], []
    for c in range(n_clusters):
        for u in range(c * users_per, (c + 1) * users_per):
            liked = rng.choice(
                np.arange(c * items_per, (c + 1) * items_per), size=12, replace=False
            )
            tu.extend([u] * 9)
            ti.extend(liked[:9])
            su.extend([u] * 3)
            si.extend(liked[9:])
    from idgrec_tpu.data.dataset import Dataset

    data = Dataset.from_pairs(tu, ti, su, si, name="blocks")
    result = train_model(
        "LightGCN", data, config=_cfg(learn_rate=0.05, training_epochs=25, interval=5),
        seed=1, log_dir=None, echo=False,
    )
    # random ranking recall@5 ~= 5/100 items = 0.05; require far better
    assert result.best.recall[1] > 0.3


def test_early_stopping_stops():
    data = _data(seed=5)
    cfg = _cfg(early_stopping=1, interval=1, learn_rate=0.0)  # lr 0 -> no improvement
    result = train_model("MFBPR", data, config=cfg, seed=2, log_dir=None, echo=False, max_epochs=50)
    assert len(result.history) < 50
    assert result.best.stop


def test_log_files_written(tmp_path):
    data = _data(seed=6)
    train_model(
        "MFBPR", data, config=_cfg(), seed=2, log_dir=str(tmp_path), echo=False, max_epochs=1
    )
    log_file = tmp_path / "MFBPR" / "tiny.log"
    assert log_file.exists()
    text = log_file.read_text()
    assert "Epoch:    1 | Training time:" in text
    assert "training loss:" in text
    assert "Best epoch:" in text
    jsonl = tmp_path / "MFBPR" / "tiny.jsonl"
    assert jsonl.exists()


def test_train_model_int8_quantized_path(tiny_dataset):
    """End-to-end training with compute_dtype=int8 (quantized fused
    propagation, interpret-mode kernel on CPU): loss must decrease and
    metrics must be finite."""
    from idgrec_tpu.config import Config
    from idgrec_tpu.engine.loop import train_model

    cfg = Config({
        "dataset": "tiny", "top_K": "[5]", "training_epochs": "4",
        "interval": "2", "early_stopping": "10", "embedding_size": "16",
        "batch_size": "64", "test_batch_size": "32", "learn_rate": "0.05",
        "reg_lambda": "0.0001", "GCN_layer": "2", "compute_dtype": "int8",
    })
    res = train_model("LightGCN", tiny_dataset, config=cfg, seed=7,
                      log_dir=None, echo=False)
    losses = [float(h["loss"].split(" = ")[0]) for h in res.history]
    assert losses[-1] < losses[0]
    assert res.best.recall is not None and float(res.best.recall[0]) >= 0.0


def test_train_model_int4_trajectory_equals_int8(tiny_dataset):
    """compute_dtype=int4 is a storage-only nibble repack of the int8
    count matrix (ops/fusedmm.py pack_nibbles) — the FULL training
    trajectory through the engine must match int8 exactly, not just the
    kernel outputs (tests/test_propagate.py). This is the admissibility
    basis for bench.py's 'best' autotune treating quant_parity.json's
    int8 evidence as covering int4."""
    import numpy as np
    from idgrec_tpu.config import Config
    from idgrec_tpu.engine.loop import train_model

    base = {
        "dataset": "tiny", "top_K": "[5]", "training_epochs": "3",
        "interval": "2", "early_stopping": "10", "embedding_size": "16",
        "batch_size": "64", "test_batch_size": "32", "learn_rate": "0.05",
        "reg_lambda": "0.0001", "GCN_layer": "2",
    }
    r8 = train_model("LightGCN", tiny_dataset,
                     config=Config(dict(base, compute_dtype="int8")),
                     seed=7, log_dir=None, echo=False)
    r4 = train_model("LightGCN", tiny_dataset,
                     config=Config(dict(base, compute_dtype="int4")),
                     seed=7, log_dir=None, echo=False)
    assert [h["loss"] for h in r8.history] == [h["loss"] for h in r4.history]
    for key in r8.params:
        np.testing.assert_array_equal(np.asarray(r8.params[key]),
                                      np.asarray(r4.params[key]))
    np.testing.assert_array_equal(r8.best.recall, r4.best.recall)


def test_evaluator_approx_topk_close_to_exact(tiny_dataset):
    import jax
    import numpy as np
    from idgrec_tpu.config import Config
    from idgrec_tpu.engine.evaluator import Evaluator
    from idgrec_tpu.models import get_model

    base = {"dataset": "tiny", "top_K": "[5]", "embedding_size": "16",
            "batch_size": "64", "test_batch_size": "32", "learn_rate": "0.05",
            "reg_lambda": "0.0001", "GCN_layer": "2"}
    model = get_model("LightGCN")(Config(dict(base)), tiny_dataset)
    rng = jax.random.PRNGKey(0)
    params = model.init_params(rng)
    exact = Evaluator(model, tiny_dataset, Config(dict(base)))
    approx = Evaluator(model, tiny_dataset, Config(dict(base, eval_topk="approx")))
    re = exact.evaluate(params, {}, (), rng)
    ra = approx.evaluate(params, {}, (), rng)
    # tiny catalogs: approx reduces to exact behavior; allow small slack
    np.testing.assert_allclose(ra["recall"], re["recall"], atol=0.05)
