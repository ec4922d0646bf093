"""Multi-host (multi-process) training equivalence.

VERDICT round-1 item 4: the engine must work under
`jax.process_count() > 1`, where plain `jax.device_put` onto mesh-wide
shardings is illegal — placement goes through `global_put`
(parallel/mesh.py), each host materializing only its addressable
shards. Validated here with a REAL 2-process `jax.distributed` CPU
cluster (2 local devices per process, 4 global devices, 2x2 mesh)
trained via the public `train_model` path and compared against the
identical single-process 4-device run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env():
    env = dict(os.environ)
    # fresh backend choice per worker; the parent test env pins CPU
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


# Coordination-service failure signatures that are load artifacts of
# running a 2-process gloo cluster on one saturated CI host (a slow or
# OOM-killed worker trips the others' barriers/heartbeats), not bugs in
# the code under test. Real failures reproduce across retries.
_FLAKE_MARKERS = (
    "Barrier timed out",
    "Shutdown barrier",
    "DEADLINE_EXCEEDED",
    "another task died",
    "detected fatal errors",
    "coordination service",
    "Connection reset by peer",
    "heartbeat",
)


def _run_cluster(nproc: int, local_devices: int, out_path: str, _retries: int = 2):
    coord = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, str(nproc), str(pid),
             str(local_devices), out_path],
            cwd=REPO, env=_env(),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(nproc)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out.decode(errors="replace"))
    if any(p.returncode != 0 for p in procs):
        joined = "\n".join(outs)
        matched = [m for m in _FLAKE_MARKERS if m in joined]
        if _retries > 0 and matched:
            # visible in the test report (-s / captured output) so a
            # masked-flake spike is observable in CI, not silent: print
            # which marker fired and the failing worker's tail
            failing = next(
                (i, out) for i, (p, out) in enumerate(zip(procs, outs))
                if p.returncode != 0)
            print(
                f"[test_multihost] RETRY {3 - _retries}: flake marker(s) "
                f"{matched!r} matched; worker {failing[0]} tail:\n"
                f"{failing[1][-1500:]}",
                file=sys.stderr, flush=True,
            )
            # fresh out_path: the worker derives its checkpoint dir from
            # it (out_path + ".ck"), and a first attempt that timed out
            # AFTER training may have left a completed ckpt_2 behind —
            # the retry's resume leg would then train zero epochs
            return _run_cluster(nproc, local_devices, out_path + ".retry",
                                _retries=_retries - 1)
    all_tails = "\n\n".join(
        f"--- worker {i} rc={p.returncode} ---\n{out[-4000:]}"
        for i, (p, out) in enumerate(zip(procs, outs)))
    for p in procs:
        assert p.returncode == 0, all_tails
    with open(out_path) as f:
        return json.load(f)


def test_two_process_training_matches_single_process(tmp_path):
    multi = _run_cluster(2, 2, str(tmp_path / "multi.json"))
    single = _run_cluster(1, 4, str(tmp_path / "single.json"))

    assert multi["process_count"] == 2
    assert single["process_count"] == 1
    assert len(multi["losses"]) == len(single["losses"]) == 2
    np.testing.assert_allclose(multi["losses"], single["losses"], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(multi["recall"], single["recall"], atol=1e-6)
    np.testing.assert_allclose(multi["ndcg"], single["ndcg"], atol=1e-6)
    # NCL: epoch context derived from sharded params (k-means) places
    # via global_put's on-device reshard branch under 2 processes
    np.testing.assert_allclose(multi["ncl_losses"], single["ncl_losses"],
                               rtol=5e-3, atol=1e-3)
    # checkpoint/resume under 2 processes: the save's host-gather is a
    # collective joined by every process; the resumed run's epoch-2 loss
    # must equal the straight run's (same trajectory after reload)
    np.testing.assert_allclose(multi["resumed_losses"][-1],
                               multi["losses"][-1], rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(multi["resumed_recall"], multi["recall"],
                               atol=1e-6)
