"""Serving API: top-k recommendations with seen-item filtering."""

import numpy as np
import pytest

from idgrec_tpu.config import Config
from idgrec_tpu.data.dataset import make_synthetic_dataset
from idgrec_tpu.engine.loop import train_model
from idgrec_tpu.serving import Recommender


@pytest.fixture(scope="module")
def trained():
    data = make_synthetic_dataset(50, 80, 900, 200, seed=4, name="tiny")
    cfg = Config({
        "dataset": "tiny", "top_K": "[3, 5]", "training_epochs": "2",
        "interval": "1", "embedding_size": "16", "batch_size": "128",
        "test_batch_size": "32", "learn_rate": "0.05",
        "reg_lambda": "0.0001", "GCN_layer": "2",
    })
    result = train_model("LightGCN", data, config=cfg, seed=1, log_dir=None, echo=False)
    return data, cfg, result


def test_recommend_filters_seen(trained):
    data, cfg, result = trained
    rec = Recommender.from_train_result("LightGCN", data, cfg, result)
    users = [0, 3, 7]
    items, scores = rec.recommend(users, k=5)
    assert items.shape == (3, 5) and scores.shape == (3, 5)
    for row, u in enumerate(users):
        seen = set(data.positive_items(u).tolist())
        assert not (set(items[row].tolist()) & seen), "recommended a seen item"
        # scores sorted descending
        assert (np.diff(scores[row]) <= 1e-6).all()


def test_recommend_unfiltered_ranks_everything(trained):
    data, cfg, result = trained
    rec = Recommender.from_train_result("LightGCN", data, cfg, result, filter_seen=False)
    items, scores = rec.recommend([5], k=data.num_items)
    assert sorted(items[0].tolist()) == list(range(data.num_items))


def test_recommend_validates_users(trained):
    data, cfg, result = trained
    rec = Recommender.from_train_result("LightGCN", data, cfg, result)
    with pytest.raises(ValueError):
        rec.recommend([data.num_users + 5], k=3)


def test_recommend_odd_batch_sizes(trained):
    data, cfg, result = trained
    rec = Recommender.from_train_result("LightGCN", data, cfg, result)
    for b in (1, 3, 17):
        items, scores = rec.recommend(list(range(b)), k=4)
        assert items.shape == (b, 4)


def test_recommend_approx_topk(trained):
    from idgrec_tpu.serving import Recommender

    data, cfg, result = trained
    rec = Recommender.from_train_result("LightGCN", data, cfg, result,
                                        topk_mode="approx")
    items, scores = rec.recommend([0, 1], k=5)
    assert items.shape == (2, 5) and scores.shape == (2, 5)
    import numpy as np
    assert np.all(items >= 0) and np.all(items < data.num_items)


def test_recommender_mesh_matches_single_device(trained):
    """Serving with the item axis sharded (parallel/topk.sharded_topk):
    identical recommendations to the single-device path."""
    from idgrec_tpu.parallel.mesh import make_mesh

    data, cfg, result = trained
    rec1 = Recommender.from_train_result("LightGCN", data, cfg, result)
    rec2 = Recommender.from_train_result(
        "LightGCN", data, cfg, result, mesh=make_mesh(8, data_parallel=2)
    )
    users = [0, 3, 7, 11]
    items1, scores1 = rec1.recommend(users, k=5)
    items2, scores2 = rec2.recommend(users, k=5)
    np.testing.assert_array_equal(items1, items2)
    np.testing.assert_allclose(scores1, scores2, rtol=1e-5, atol=1e-6)


def test_from_checkpoint_matches_train_result(trained, tmp_path):
    """The deploy path: train with checkpointing in one 'process',
    serve from the saved weights in another — recommendations must
    equal serving directly from the train result."""
    data, cfg, _ = trained
    ck = str(tmp_path / "ck")
    result = train_model("LightGCN", data, config=cfg, seed=1, log_dir=None,
                         echo=False, checkpoint_dir=ck, checkpoint_every=1)
    direct = Recommender.from_train_result("LightGCN", data, cfg, result)
    served = Recommender.from_checkpoint("LightGCN", data, cfg, ck)
    users = [0, 7, 23, 49]
    di, dscore = direct.recommend(users, k=5)
    si, sscore = served.recommend(users, k=5)
    np.testing.assert_array_equal(di, si)
    np.testing.assert_allclose(dscore, sscore, rtol=1e-6)


def test_from_checkpoint_mesh_trained_serves_single_device(trained, tmp_path):
    """A checkpoint written by MESH training stores 128-padded tables
    (parallel/padding.py); serving single-chip from it must slice the
    real rows and produce the same recommendations as serving from the
    mesh train result's true-shape params."""
    from idgrec_tpu.parallel.mesh import make_mesh

    data, cfg, _ = trained
    ck = str(tmp_path / "ckm")
    mesh = make_mesh(8, data_parallel=2)
    result = train_model("LightGCN", data, config=cfg, seed=1, log_dir=None,
                         echo=False, mesh=mesh,
                         checkpoint_dir=ck, checkpoint_every=1)
    direct = Recommender.from_train_result("LightGCN", data, cfg, result)
    served = Recommender.from_checkpoint("LightGCN", data, cfg, ck)
    users = [0, 7, 23, 49]
    di, dscore = direct.recommend(users, k=5)
    si, sscore = served.recommend(users, k=5)
    np.testing.assert_array_equal(di, si)
    np.testing.assert_allclose(dscore, sscore, rtol=1e-5, atol=1e-6)
