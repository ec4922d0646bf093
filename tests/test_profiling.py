"""Throughput meter + debug options."""

import numpy as np

from idgrec_tpu.config import Config
from idgrec_tpu.engine.profiling import ThroughputMeter, debug_options, maybe_trace


def test_meter_rates():
    m = ThroughputMeter(num_train=1_237_259, nnz=1_237_259, emb_size=64,
                        num_layers=3, steps_per_epoch=605,
                        dense_dims=(31744, 38144))
    r = m.rates(12.8)
    assert abs(r["pairs_per_sec"] - 1_237_259 / 12.8) < 1e-6
    # 2 FLOPs * 2*nnz * d per application, 2*3*605 applications
    expect_sparse = 2.0 * 2 * 1_237_259 * 64 * (2 * 3 * 605) / 12.8 / 1e9
    assert abs(r["sparse_gflops"] - expect_sparse) / expect_sparse < 1e-9
    assert r["mxu_gflops"] > r["sparse_gflops"]  # dense does more raw FLOPs


def test_meter_no_dense():
    m = ThroughputMeter(num_train=10, nnz=10, emb_size=4, num_layers=1,
                        steps_per_epoch=1)
    assert m.rates(1.0)["mxu_gflops"] == 0.0


def test_maybe_trace_noop():
    with maybe_trace(None):
        x = np.ones(3).sum()
    assert x == 3.0


def test_debug_options_accepts_flag():
    import jax
    debug_options(Config({"dataset": "x", "debug_nans": "0"}))
    assert jax.config.jax_debug_nans is False
