import numpy as np

from idgrec_tpu.data.dataset import Dataset, make_synthetic_dataset


def test_counts_and_ids(tiny_dataset):
    d = tiny_dataset
    # max user id = 4 (train) / 4 (test); max item id = 7
    assert d.num_users == 5
    assert d.num_items == 8
    assert d.num_nodes == 13
    assert d.num_train == 12
    assert d.num_test == 6


def test_csr_structure(tiny_dataset):
    d = tiny_dataset
    assert list(d.positive_items(0)) == [0, 1, 2]
    assert list(d.positive_items(1)) == [1, 3]
    assert list(d.positive_items(2)) == [0, 4, 5, 6]
    assert list(d.positive_items(3)) == [2]
    assert list(d.positive_items(4)) == [6, 7]
    csr = d.to_scipy_csr()
    assert csr.shape == (5, 8)
    assert csr.nnz == 12


def test_test_dict(tiny_dataset):
    d = tiny_dataset
    assert d.test_dict == {0: [3, 4], 1: [0], 2: [7], 4: [0, 1]}
    truth = d.padded_test_truth(np.array([0, 1]))
    assert truth.shape == (2, 2)
    assert list(truth[0]) == [3, 4]
    assert list(truth[1]) == [0, -1]


def test_statistics_format(tiny_dataset):
    s = tiny_dataset.get_statistics()
    # exact reference format (data_loader.py:80-86)
    assert s.startswith("dataset:tiny\tnum_users:5, num_items:8 \t|num_train:12,")
    assert "sparsity: " in s


def test_duplicate_pairs_summed():
    d = Dataset.from_pairs(
        train_user=[0, 0, 0], train_item=[1, 1, 2], test_user=[0], test_item=[3]
    )
    assert d.num_train == 3
    assert d.nnz == 2  # unique pairs
    assert d.csr_vals.tolist() == [2.0, 1.0]


def test_dense_user_rows(tiny_dataset):
    rows = tiny_dataset.dense_user_rows(np.array([0, 3]))
    assert rows.shape == (2, 8)
    assert rows[0].tolist() == [1, 1, 1, 0, 0, 0, 0, 0]
    assert rows[1].tolist() == [0, 0, 1, 0, 0, 0, 0, 0]


def test_sparsity_split(tiny_dataset):
    split_uids, split_state = tiny_dataset.create_sparsity_split()
    got = sorted(u for grp in split_uids for u in grp)
    assert got == sorted(tiny_dataset.test_dict.keys())
    assert len(split_state) == len(split_uids)


def test_synthetic_dataset_scales():
    d = make_synthetic_dataset(100, 200, 1000, 100, seed=1)
    assert d.num_users == 100 and d.num_items == 200
    assert d.num_train == 1000 and d.num_test == 100
    assert d.row_ptr[-1] == d.nnz
    assert (np.diff(d.row_ptr) >= 0).all()


def test_load_matches_reference_testfile():
    """Parse a slice of the real reference test.txt format."""
    import os

    ref = "/root/reference/dataset/yelp2018/test.txt"
    if not os.path.exists(ref):
        return
    from idgrec_tpu.data.dataset import _parse_interaction_file

    uniq, users, items, lengths = _parse_interaction_file(ref)
    assert users.size == items.size
    assert users.size == sum(lengths)
    # yelp2018 test interactions per BASELINE.md
    assert users.size == 324147
    assert int(uniq.size) == 31668


def test_latent_synthetic_dataset_structure():
    from idgrec_tpu.data.dataset import make_latent_synthetic_dataset

    d = make_latent_synthetic_dataset(50, 80, 800, 200, seed=0)
    assert d.num_users == 50 and d.num_items == 80
    assert d.num_train + d.num_test <= 50 * 80
    # train/test disjoint per user (split of one top-k draw)
    import numpy as np
    users = np.repeat(np.arange(50), np.diff(d.row_ptr))
    train_pairs = set(zip(users.tolist(), d.col_idx.tolist()))
    test_pairs = set()
    for u, items in d.test_dict.items():
        for i in items:
            test_pairs.add((int(u), int(i)))
    assert not (train_pairs & test_pairs)
    assert len(test_pairs) == d.num_test
