"""Low-rank SVD of the normalized interaction matrix (LightGCL init).

The reference computes ``torch.svd_lowrank(R̃, q)`` once at model init
(models/LightGCL.py:38-47) — a randomized approximation. Here the
host-side preprocessing uses scipy's exact sparse truncated SVD when
available, with a numpy randomized subspace-iteration fallback; either
way the result is rank-q factors of the same R̃ (the exact variant is
at least as good an approximation as the reference's randomized one).
"""

from __future__ import annotations

import numpy as np


def lowrank_svd(R_csr, q: int, seed: int = 0):
    """Rank-q SVD factors (u [m,q], s [q], v [n,q]) of a scipy sparse R."""
    try:
        from scipy.sparse.linalg import svds

        u, s, vt = svds(R_csr.astype(np.float64), k=q)
        order = np.argsort(-s)
        return (
            u[:, order].astype(np.float32),
            s[order].astype(np.float32),
            vt[order].T.astype(np.float32),
        )
    except Exception:
        return _randomized_svd(R_csr, q, seed)


def _randomized_svd(R_csr, q: int, seed: int, oversample: int = 8, iters: int = 4):
    rng = np.random.default_rng(seed)
    m, n = R_csr.shape
    k = min(q + oversample, min(m, n))
    g = rng.normal(size=(n, k))
    y = R_csr @ g
    for _ in range(iters):
        y, _ = np.linalg.qr(y)
        y = R_csr @ (R_csr.T @ y)
    qmat, _ = np.linalg.qr(y)
    b = qmat.T @ R_csr
    ub, s, vt = np.linalg.svd(b, full_matrices=False)
    u = qmat @ ub
    return (
        u[:, :q].astype(np.float32),
        s[:q].astype(np.float32),
        vt[:q].T.astype(np.float32),
    )
