import jax
import jax.numpy as jnp
import numpy as np

from idgrec_tpu.config import Config
from idgrec_tpu.data.dataset import make_synthetic_dataset
from idgrec_tpu.engine import checkpoint as ckpt
from idgrec_tpu.engine.loop import train_model


def _cfg(**over):
    base = {
        "dataset": "tiny", "top_K": "[3, 5]", "training_epochs": "4",
        "early_stopping": "10", "interval": "1", "embedding_size": "8",
        "batch_size": "64", "test_batch_size": "32", "learn_rate": "0.01",
        "reg_lambda": "0.0001", "GCN_layer": "2",
    }
    base.update({k: str(v) for k, v in over.items()})
    return Config(base)


def test_save_load_roundtrip(tmp_path):
    tree = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": {"c": jnp.asarray([1, 2, 3], jnp.int32)},
    }
    ckpt.save_checkpoint(str(tmp_path), 5, tree, np_rng_state=None, best=None)
    assert ckpt.latest_checkpoint(str(tmp_path)) == 5
    template = jax.tree.map(jnp.zeros_like, tree)
    restored, meta = ckpt.load_checkpoint(str(tmp_path), 5, template)
    assert meta["epoch"] == 5
    np.testing.assert_array_equal(np.asarray(restored["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(np.asarray(restored["b"]["c"]), np.asarray(tree["b"]["c"]))


def test_keep_prunes_old(tmp_path):
    tree = {"a": jnp.zeros(2)}
    for e in (1, 2, 3, 4):
        ckpt.save_checkpoint(str(tmp_path), e, tree, keep=2)
    assert sorted(ckpt._list_epochs(str(tmp_path))) == [3, 4]


def test_resume_continues_training(tmp_path):
    data = make_synthetic_dataset(40, 60, 800, 160, seed=2, name="tiny")
    ck = str(tmp_path / "ck")
    # run 2 epochs with checkpointing
    r1 = train_model("MFBPR", data, config=_cfg(), seed=5, log_dir=None, echo=False,
                     max_epochs=2, checkpoint_dir=ck)
    assert ckpt.latest_checkpoint(ck) == 2
    # resume to 4 epochs: should run exactly 2 more
    r2 = train_model("MFBPR", data, config=_cfg(), seed=5, log_dir=None, echo=False,
                     max_epochs=4, checkpoint_dir=ck)
    assert [h["epoch"] for h in r2.history] == [3, 4]
    # uninterrupted run for comparison: final losses in the same range
    r3 = train_model("MFBPR", data, config=_cfg(), seed=5, log_dir=None, echo=False,
                     max_epochs=4)
    l2 = float(r2.history[-1]["loss"].split(" = ")[0])
    l3 = float(r3.history[-1]["loss"].split(" = ")[0])
    assert abs(l2 - l3) / max(abs(l3), 1e-6) < 0.2


def test_sparsity_eval_mode():
    data = make_synthetic_dataset(40, 60, 800, 160, seed=4, name="tiny")
    result = train_model(
        "MFBPR", data, config=_cfg(sparsity_test=1), seed=5, log_dir=None,
        echo=False, max_epochs=1,
    )
    assert result.best.recall is not None


def test_mesh_checkpoint_resume_matches_straight_run(tmp_path):
    """Checkpoint/resume UNDER A MESH: interrupted training (2 epochs,
    checkpoint, fresh process state, 2 more) must match a straight
    4-epoch mesh run, and the resumed state must still be row-sharded
    P('model', None) — loaded checkpoints are host numpy and must be
    re-placed with the template's shardings, not left to default
    (replicated) placement."""
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from idgrec_tpu.config import Config
    from idgrec_tpu.data.dataset import make_synthetic_dataset
    from idgrec_tpu.engine.loop import train_model
    from idgrec_tpu.parallel.mesh import make_mesh

    data = make_synthetic_dataset(67, 83, 1024, 128, seed=21, name="tiny")
    cfg = {
        "dataset": "tiny", "top_K": "[5]", "training_epochs": "4",
        "interval": "1", "early_stopping": "100", "embedding_size": "16",
        "batch_size": "64", "test_batch_size": "32", "learn_rate": "0.05",
        "reg_lambda": "0.0001", "GCN_layer": "2",
    }
    mesh = make_mesh(8, data_parallel=2)
    straight = train_model("LightGCN", data, config=Config(dict(cfg)), seed=5,
                           log_dir=None, echo=False, mesh=mesh)

    ck = str(tmp_path / "ck")
    train_model("LightGCN", data, config=Config(dict(cfg, training_epochs="2")),
                seed=5, log_dir=None, echo=False, mesh=mesh,
                checkpoint_dir=ck, checkpoint_every=1)
    resumed = train_model("LightGCN", data, config=Config(dict(cfg)), seed=5,
                          log_dir=None, echo=False, mesh=mesh,
                          checkpoint_dir=ck, checkpoint_every=1)

    assert resumed.sharded_params["user_emb"].sharding.spec == P("model", None)
    for key in straight.params:
        np.testing.assert_allclose(
            np.asarray(straight.params[key]), np.asarray(resumed.params[key]),
            rtol=2e-5, atol=1e-6, err_msg=f"param {key} diverged after resume")
    np.testing.assert_allclose(straight.best.recall, resumed.best.recall, atol=1e-6)


def test_checkpoint_cadence_independent_of_eval_interval(tmp_path):
    """checkpoint_every=1 must save every epoch even when interval=4
    (previously the save was nested inside the eval branch, silently
    AND-ing the two cadences)."""
    import os

    from idgrec_tpu.config import Config
    from idgrec_tpu.data.dataset import make_synthetic_dataset
    from idgrec_tpu.engine.loop import train_model

    data = make_synthetic_dataset(50, 60, 500, 80, seed=1, name="tiny")
    cfg = Config({
        "dataset": "tiny", "top_K": "[5]", "training_epochs": "4",
        "interval": "4", "early_stopping": "100", "embedding_size": "8",
        "batch_size": "64", "test_batch_size": "32", "learn_rate": "0.05",
        "reg_lambda": "0.0001", "GCN_layer": "1",
    })
    ck = str(tmp_path / "ck")
    train_model("LightGCN", data, config=cfg, seed=5, log_dir=None, echo=False,
                checkpoint_dir=ck, checkpoint_every=1)
    # keep=2 prunes older ones; the last two epochs must both be there
    saved = sorted(f for f in os.listdir(ck) if f.endswith(".npz"))
    assert saved == ["ckpt_3.npz", "ckpt_4.npz"], saved


def test_load_rejects_incompatible_trailing_dims(tmp_path):
    """A checkpoint whose leaves differ from the template in a TRAILING
    dim (e.g. the run was re-configured with a different embedding_size)
    must raise, not silently slice columns into truncated garbage —
    only the leading dim may differ (128-row padded storage)."""
    import pytest

    tree = {"emb": jnp.ones((40, 64), jnp.float32)}
    ckpt.save_checkpoint(str(tmp_path), 1, tree)
    template = {"emb": jnp.zeros((40, 32), jnp.float32)}
    with pytest.raises(ValueError, match="incompatible"):
        ckpt.load_checkpoint(str(tmp_path), 1, template)


def test_load_pads_rows_for_padded_template(tmp_path):
    """Single-chip (true-shape) checkpoint resumed on a mesh: the
    template's tables are 128-row padded — the loader zero-pads the
    missing rows (the pad_tree contract) instead of dying in reshape."""
    tree = {"emb": jnp.arange(40 * 8, dtype=jnp.float32).reshape(40, 8)}
    ckpt.save_checkpoint(str(tmp_path), 1, tree)
    template = {"emb": jnp.zeros((128, 8), jnp.float32)}
    restored, _ = ckpt.load_checkpoint(str(tmp_path), 1, template)
    got = np.asarray(restored["emb"])
    np.testing.assert_array_equal(got[:40], np.asarray(tree["emb"]))
    assert not got[40:].any()


def test_single_chip_checkpoint_resumes_on_mesh(tmp_path):
    """End-to-end topology change: train single-chip with checkpoints,
    resume the same run on an 8-device mesh — must continue training
    (padded template rows zero-filled) and finish with finite loss."""
    from idgrec_tpu.parallel.mesh import make_mesh

    data = make_synthetic_dataset(67, 83, 800, 160, seed=2, name="tiny")
    ck = str(tmp_path / "ck")
    train_model("LightGCN", data, config=_cfg(), seed=5, log_dir=None,
                echo=False, max_epochs=2, checkpoint_dir=ck)
    mesh = make_mesh(8, data_parallel=2)
    r = train_model("LightGCN", data, config=_cfg(), seed=5, log_dir=None,
                    echo=False, max_epochs=4, checkpoint_dir=ck, mesh=mesh)
    assert [h["epoch"] for h in r.history] == [3, 4]
    assert np.isfinite(float(r.history[-1]["loss"].split(" = ")[0]))
