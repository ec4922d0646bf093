"""Native C++ data kernels vs their Python fallbacks."""

import os

import numpy as np
import pytest

from idgrec_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def _write_ratings(path, rng, num_users=40, num_items=70):
    lines = []
    expected = []
    for u in range(num_users):
        k = int(rng.integers(0, 6))
        items = rng.choice(num_items, size=k, replace=False)
        lines.append(" ".join([str(u)] + [str(int(i)) for i in items]))
        expected.extend((u, int(i)) for i in items)
    path.write_text("\n".join(lines) + "\n")
    return expected


def test_parse_matches_python(tmp_path, rng):
    p = tmp_path / "train.txt"
    expected = _write_ratings(p, rng)
    users, items = native.parse_ratings(str(p))
    assert list(zip(users.tolist(), items.tolist())) == expected


def test_parse_handles_crlf_and_blank_lines(tmp_path):
    p = tmp_path / "train.txt"
    p.write_bytes(b"0 1 2\r\n\r\n3 4\n7\n")
    users, items = native.parse_ratings(str(p))
    assert users.tolist() == [0, 0, 3]
    assert items.tolist() == [1, 2, 4]


def test_build_csr_sorted_rows(rng):
    users = np.asarray([2, 0, 2, 1, 0, 2], np.int64)
    items = np.asarray([5, 3, 1, 9, 0, 4], np.int64)
    row_ptr, col_idx, vals = native.build_csr(users, items, 4)
    assert row_ptr.tolist() == [0, 2, 3, 6, 6]
    assert col_idx.tolist() == [0, 3, 9, 1, 4, 5]
    assert (vals == 1.0).all()


def test_fill_count_matrix(rng):
    users = np.asarray([0, 0, 1, 1, 1], np.int64)
    items = np.asarray([1, 1, 0, 2, 2], np.int64)
    row_ptr, col_idx, _ = native.build_csr(users, items, 2)
    m = native.fill_count_matrix(row_ptr, col_idx, 2, 3)
    assert m.tolist() == [[0, 2, 0], [1, 0, 2]]


def test_pack_rows_matches_numpy(rng):
    m = (rng.random((37, 53)) < 0.3).astype(np.int8)
    packed = native.pack_rows(m, 40, 64)
    ref = np.packbits(m != 0, axis=0, bitorder="little")
    assert np.array_equal(packed[: ref.shape[0], : m.shape[1]], ref)
    assert packed[:, m.shape[1]:].sum() == 0


def test_dataset_load_uses_native_and_matches_python(tmp_path, rng, monkeypatch):
    from idgrec_tpu.data.dataset import Dataset

    p = tmp_path / "ds"
    p.mkdir()
    _write_ratings(p / "train.txt", rng)
    _write_ratings(p / "test.txt", rng, num_users=30)
    d_native = Dataset.load(str(p), name="x")
    monkeypatch.setenv("IDGREC_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    d_python = Dataset.load(str(p), name="x")
    assert d_native.num_users == d_python.num_users
    assert d_native.num_items == d_python.num_items
    np.testing.assert_array_equal(d_native.row_ptr, d_python.row_ptr)
    np.testing.assert_array_equal(d_native.col_idx, d_python.col_idx)
    np.testing.assert_array_equal(d_native.train_user, d_python.train_user)
    assert d_native.pos_length == d_python.pos_length
