"""Top-K ranking metrics, computed on device.

Same math as the reference metrics module
(utility/utility_function/metrics.py): binary hit labels from the
recommended top-K list (metrics.py:49-58), then

* Recall@k  = Σ_u hits_u(k) / |test(u)|          (metrics.py:25-29)
* Precision@k = Σ_u hits_u(k) / k                 (metrics.py:32-36)
* NDCG@k with binary gains and IDCG over min(k, |test(u)|)
                                                  (metrics.py:4-22)

All functions return per-batch SUMS (the caller divides by the total
number of test users, as batch_test.py:89-91 does), so metric
accumulation across user batches is a plain add — jit/psum friendly.
"""

from __future__ import annotations

import jax.numpy as jnp


def hit_matrix(topk_items: jnp.ndarray, truth: jnp.ndarray) -> jnp.ndarray:
    """Binary [B, K] labels: topk_items[b, k] ∈ truth[b].

    truth is padded with -1 (never a valid item id).
    """
    eq = topk_items[:, :, None] == truth[:, None, :]
    return jnp.any(eq, axis=-1).astype(jnp.float32)


def truth_sizes(truth: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(truth >= 0, axis=1)


def topk_metric_sums(
    topk_items: jnp.ndarray,
    truth: jnp.ndarray,
    ks: tuple[int, ...],
    valid: jnp.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    """Batch-summed recall/precision/ndcg at each k.

    topk_items: [B, K_max] recommended ids (K_max >= max(ks))
    truth:      [B, T] ground-truth ids padded with -1
    valid:      [B] bool — rows to count (padding users excluded)

    Returns {"recall": [len(ks)], "precision": ..., "ndcg": ...,
    "count": scalar} — sums over valid rows.
    """
    r = hit_matrix(topk_items, truth)
    sizes = truth_sizes(truth).astype(jnp.float32)
    if valid is None:
        valid_f = jnp.ones(r.shape[0], dtype=jnp.float32)
    else:
        valid_f = valid.astype(jnp.float32)
    # avoid 0/0 on padded rows
    safe_sizes = jnp.maximum(sizes, 1.0)

    positions = jnp.arange(r.shape[1], dtype=jnp.float32)
    discounts = 1.0 / jnp.log2(positions + 2.0)

    recalls, precisions, ndcgs = [], [], []
    for k in ks:
        hits_k = jnp.sum(r[:, :k], axis=1)
        recalls.append(jnp.sum(valid_f * hits_k / safe_sizes))
        precisions.append(jnp.sum(valid_f * hits_k) / k)

        dcg = jnp.sum(r[:, :k] * discounts[:k], axis=1)
        # ideal DCG: first min(k, |test(u)|) positions are hits
        ideal_hits = jnp.minimum(sizes, float(k))
        cum_discount = jnp.cumsum(discounts[:k])
        # idcg(u) = cum_discount[ideal_hits(u) - 1]; 0 hits -> idcg 1 (metrics.py:19)
        idx = jnp.clip(ideal_hits.astype(jnp.int32) - 1, 0, k - 1)
        idcg = jnp.where(ideal_hits > 0, cum_discount[idx], 1.0)
        ndcg = jnp.where(idcg > 0, dcg / idcg, 0.0)
        ndcgs.append(jnp.sum(valid_f * ndcg))

    return {
        "recall": jnp.stack(recalls),
        "precision": jnp.stack(precisions),
        "ndcg": jnp.stack(ndcgs),
        "count": jnp.sum(valid_f),
    }


def f1(precision, recall):
    """Element-wise F1 from per-k precision/recall arrays
    (metrics.py:39-46: 0 where precision + recall == 0)."""
    precision = jnp.asarray(precision, jnp.float32)
    recall = jnp.asarray(recall, jnp.float32)
    denom = precision + recall
    return jnp.where(denom > 0, 2.0 * precision * recall / jnp.maximum(denom, 1e-30), 0.0)
