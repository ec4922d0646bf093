import numpy as np
import pytest


@pytest.fixture
def dataset_dir(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "dataset" / "tinyds"
    root.mkdir(parents=True)
    with open(root / "train.txt", "w") as f:
        for u in range(50):
            items = rng.choice(70, size=6, replace=False)
            f.write(f"{u} " + " ".join(map(str, items)) + "\n")
    with open(root / "test.txt", "w") as f:
        for u in range(50):
            items = rng.choice(70, size=2, replace=False)
            f.write(f"{u} " + " ".join(map(str, items)) + "\n")
    return tmp_path


def test_cli_end_to_end(dataset_dir, tmp_path, capsys):
    from idgrec_tpu.main import main

    code = main([
        "--model=MFBPR",
        f"--dataset_path={dataset_dir}/dataset/",
        "--dataset=tinyds",
        f"--log_dir={tmp_path}/log",
        "--epochs=2",
    ])
    assert code == 0
    out = capsys.readouterr().out
    assert "Best epoch:" in out
    assert (tmp_path / "log" / "MFBPR" / "tinyds.log").exists()


def test_cli_unknown_model_lists_and_errors(dataset_dir, capsys, monkeypatch):
    import sys

    from idgrec_tpu.main import main

    monkeypatch.setattr(sys.stdin, "isatty", lambda: False)
    code = main([f"--dataset_path={dataset_dir}/dataset/", "--dataset=tinyds"])
    assert code == 2
    out = capsys.readouterr().out
    assert "LightGCN" in out and "MFBPR" in out


def test_cli_checkpoint_resume(dataset_dir, tmp_path, capsys):
    from idgrec_tpu.main import main

    ck = f"{tmp_path}/ck"
    args = [
        "--model=MFBPR",
        f"--dataset_path={dataset_dir}/dataset/",
        "--dataset=tinyds",
        f"--log_dir={tmp_path}/log",
        f"--checkpoint_dir={ck}",
        "--epochs=2",
    ]
    assert main(args) == 0
    # resume run: loads the checkpoint at epoch 2, nothing left to train
    assert main(args) == 0
    out = capsys.readouterr().out
    assert "Best epoch:" in out


def test_cli_mesh_auto_and_off(dataset_dir, tmp_path, capsys):
    """--mesh auto spans the 8 virtual devices (tables row-sharded via
    the engine); --mesh off stays single-device. Same converged metrics
    either way."""
    from idgrec_tpu.main import main

    args = [
        "--model=LightGCN",
        f"--dataset_path={dataset_dir}/dataset/",
        "--dataset=tinyds",
        f"--log_dir={tmp_path}/log",
        "--epochs=2",
    ]
    assert main(args + ["--mesh=off"]) == 0
    out_off = capsys.readouterr().out
    assert "Mesh:" not in out_off

    assert main(args + ["--data_parallel=2"]) == 0
    out_auto = capsys.readouterr().out
    assert "Mesh: {'data': 2, 'model': 4}" in out_auto

    import re

    def best_metrics(s):
        line = [l for l in s.splitlines() if l.startswith("Best epoch:")][-1]
        return [float(x) for x in re.findall(r"\d+\.\d+", line)]

    # mesh vs single-device differ only by collective-reduction round-off
    np.testing.assert_allclose(best_metrics(out_off), best_metrics(out_auto),
                               rtol=1e-3, atol=1e-4)


def test_cli_serve_from_checkpoint(dataset_dir, tmp_path, capsys):
    """Train with checkpointing via the training CLI, then answer
    top-K requests via the serving CLI — one JSON line per user,
    seen items filtered."""
    import json

    from idgrec_tpu.main import main
    from idgrec_tpu.serve import main as serve_main

    args = [
        "--model=LightGCN",
        f"--dataset_path={dataset_dir}/dataset/",
        "--dataset=tinyds",
        f"--log_dir={tmp_path}/log",
        "--epochs=2",
        f"--checkpoint_dir={tmp_path}/ck",
    ]
    assert main(args) == 0
    capsys.readouterr()

    code = serve_main([
        "--model=LightGCN",
        f"--dataset_path={dataset_dir}/dataset/",
        "--dataset=tinyds",
        f"--checkpoint_dir={tmp_path}/ck",
        "--users=0,3,7",
        "-k", "4",
    ])
    assert code == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")]
    assert len(lines) == 3
    recs = [json.loads(l) for l in lines]
    assert [r["user"] for r in recs] == [0, 3, 7]
    for r in recs:
        assert len(r["items"]) == 4 and len(r["scores"]) == 4
        assert r["scores"] == sorted(r["scores"], reverse=True)

    # unknown model / missing checkpoint paths error cleanly
    assert serve_main(["--model=NopeModel", "--checkpoint_dir=x",
                       "--users=1"]) == 2
    assert serve_main(["--model=LightGCN",
                       f"--dataset_path={dataset_dir}/dataset/",
                       "--dataset=tinyds",
                       f"--checkpoint_dir={tmp_path}/empty",
                       "--users=1"]) == 2
