import jax.numpy as jnp
import numpy as np

from idgrec_tpu.ops.metrics import hit_matrix, topk_metric_sums


def _np_metrics(topk, truths, ks):
    """Independent numpy recomputation of the reference metric math
    (metrics.py:4-58): per-batch sums."""
    B, K = topk.shape
    r = np.zeros((B, K))
    for b in range(B):
        for k in range(K):
            r[b, k] = 1.0 if topk[b, k] in truths[b] else 0.0
    out = {"recall": [], "precision": [], "ndcg": []}
    for k in ks:
        rec = sum(r[b, :k].sum() / len(truths[b]) for b in range(B))
        prec = r[:, :k].sum() / k
        disc = 1.0 / np.log2(np.arange(2, k + 2))
        ndcg = 0.0
        for b in range(B):
            length = min(k, len(truths[b]))
            idcg = disc[:length].sum()
            dcg = (r[b, :k] * disc).sum()
            if idcg == 0:
                idcg = 1.0
            val = dcg / idcg
            ndcg += 0.0 if np.isnan(val) else val
        out["recall"].append(rec)
        out["precision"].append(prec)
        out["ndcg"].append(ndcg)
    return {k: np.array(v) for k, v in out.items()}


def _pad(truths, width):
    out = np.full((len(truths), width), -1, dtype=np.int32)
    for i, t in enumerate(truths):
        out[i, : len(t)] = t
    return out


def test_hit_matrix():
    topk = np.array([[3, 1, 7], [0, 2, 9]], dtype=np.int32)
    truth = _pad([[1, 3], [9]], 2)
    r = np.asarray(hit_matrix(jnp.asarray(topk), jnp.asarray(truth)))
    assert r.tolist() == [[1, 1, 0], [0, 0, 1]]


def test_metric_sums_match_reference_math(rng):
    B, K = 16, 10
    num_items = 50
    topk = np.stack([rng.permutation(num_items)[:K] for _ in range(B)]).astype(np.int32)
    truths = [list(rng.choice(num_items, size=rng.integers(1, 8), replace=False)) for _ in range(B)]
    ks = (3, 5, 10)
    got = topk_metric_sums(jnp.asarray(topk), jnp.asarray(_pad(truths, 8)), ks)
    want = _np_metrics(topk, truths, ks)
    np.testing.assert_allclose(np.asarray(got["recall"]), want["recall"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["precision"]), want["precision"], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got["ndcg"]), want["ndcg"], rtol=1e-5)
    assert float(got["count"]) == B


def test_valid_mask_excludes_padding(rng):
    topk = np.array([[0, 1], [2, 3], [4, 5]], dtype=np.int32)
    truth = _pad([[0], [2], [4]], 1)
    valid = jnp.asarray(np.array([True, True, False]))
    got = topk_metric_sums(jnp.asarray(topk), jnp.asarray(truth), (2,), valid=valid)
    assert float(got["recall"][0]) == 2.0  # third row ignored
    assert float(got["count"]) == 2.0


def test_perfect_ranking():
    topk = np.array([[7, 3, 0, 1]], dtype=np.int32)
    truth = _pad([[7, 3]], 2)
    got = topk_metric_sums(jnp.asarray(topk), jnp.asarray(truth), (2, 4))
    assert float(got["recall"][0]) == 1.0
    assert float(got["ndcg"][0]) == 1.0
    assert float(got["recall"][1]) == 1.0


def test_f1_matches_reference_semantics():
    import numpy as np
    from idgrec_tpu.ops.metrics import f1

    pre = np.array([0.5, 0.0, 0.2], np.float32)
    rec = np.array([0.25, 0.0, 0.3], np.float32)
    out = np.asarray(f1(pre, rec))
    # reference loop (metrics.py:39-46)
    exp = [(2 * p * r / (p + r)) if p + r > 0 else 0.0 for p, r in zip(pre, rec)]
    np.testing.assert_allclose(out, exp, rtol=1e-6)
