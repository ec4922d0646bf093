"""Test harness config: run JAX on CPU with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (the
standard JAX fake-backend technique; see SURVEY.md §4)."""

import os

# Must be set before any backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin (sitecustomize) force-selects jax_platforms at
# interpreter start; override back to CPU for the test suite.
jax.config.update("jax_platforms", "cpu")
try:
    from jax.extend.backend import clear_backends

    clear_backends()
except Exception:
    pass

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(2024)


@pytest.fixture
def tiny_dataset(tmp_path):
    """A small deterministic dataset written in the reference file format."""
    from idgrec_tpu.data.dataset import Dataset

    train_lines = [
        "0 0 1 2",
        "1 1 3",
        "2 0 4 5 6",
        "3 2",
        "4 6 7",
    ]
    test_lines = [
        "0 3 4",
        "1 0",
        "2 7",
        "4 0 1",
    ]
    (tmp_path / "train.txt").write_text("\n".join(train_lines) + "\n")
    (tmp_path / "test.txt").write_text("\n".join(test_lines) + "\n")
    return Dataset.load(str(tmp_path), name="tiny")
