"""Loss library (pure jnp, always computed in float32).

Semantic parity with the reference loss module
(utility/utility_function/losses.py) including its literal epsilon
constants (``10e-8`` = 1e-7 in BPR losses.py:11, ``10e-6`` = 1e-5 in
InfoNCE losses.py:34): those offsets shift loss values slightly and are
kept so training-loss traces are comparable.

All functions take/return jnp arrays and are jit/vmap/grad-safe.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BPR_EPS = 10e-8  # sic (== 1e-7), losses.py:11
_INFONCE_EPS = 10e-6  # sic (== 1e-5), losses.py:34
_INFONCE_ALL_EPS = 10e-8  # losses.py:49


def _f32(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.float32)


def _matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f32 matmul pinned to full precision: TPU MXU otherwise truncates
    f32 operands to bf16, which the exp() in the contrastive losses
    amplifies into visible loss drift."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2 normalize, matching torch.nn.functional.normalize semantics
    (norm clamped below by eps)."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)


def bpr_loss(user_e: jnp.ndarray, pos_e: jnp.ndarray, neg_e: jnp.ndarray) -> jnp.ndarray:
    """Bayesian personalized ranking loss (losses.py:4-13)."""
    user_e, pos_e, neg_e = _f32(user_e), _f32(pos_e), _f32(neg_e)
    pos_score = jnp.sum(user_e * pos_e, axis=1)
    neg_score = jnp.sum(user_e * neg_e, axis=1)
    loss = -jnp.log(jax.nn.sigmoid(pos_score - neg_score) + _BPR_EPS)
    return jnp.mean(loss)


def reg_loss(*embeddings: jnp.ndarray) -> jnp.ndarray:
    """L2 regularization: sum over args of ½‖E‖²_F / rows(E)
    (losses.py:16-21)."""
    total = jnp.float32(0.0)
    for e in embeddings:
        e = _f32(e)
        total = total + 0.5 * jnp.sum(e * e) / e.shape[0]
    return total


def infonce_loss(emb_1: jnp.ndarray, emb_2: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """In-batch InfoNCE with both views L2-normalized (losses.py:24-35).

    Denominator runs over emb_2's batch (emb_1 @ emb_2ᵀ).
    """
    emb_1 = _normalize(_f32(emb_1))
    emb_2 = _normalize(_f32(emb_2))
    pos_score = jnp.exp(jnp.sum(emb_1 * emb_2, axis=-1) / temperature)
    ttl_score = jnp.sum(jnp.exp(_matmul(emb_1, emb_2.T) / temperature), axis=1)
    return jnp.mean(-jnp.log(pos_score / ttl_score + _INFONCE_EPS))


def infonce_loss_all(
    emb_1: jnp.ndarray,
    emb_2: jnp.ndarray,
    emb_2_all: jnp.ndarray,
    temperature: float,
) -> jnp.ndarray:
    """InfoNCE against an explicit negative pool (losses.py:38-50)."""
    emb_1 = _normalize(_f32(emb_1))
    emb_2 = _normalize(_f32(emb_2))
    emb_2_all = _normalize(_f32(emb_2_all))
    pos_score = jnp.exp(jnp.sum(emb_1 * emb_2, axis=-1) / temperature)
    ttl_score = jnp.sum(jnp.exp(_matmul(emb_1, emb_2_all.T) / temperature), axis=1)
    return jnp.mean(-jnp.log(pos_score / ttl_score + _INFONCE_ALL_EPS))


def infonce_loss_sum(emb_1: jnp.ndarray, emb_2: jnp.ndarray, emb_all: jnp.ndarray, temperature: float) -> jnp.ndarray:
    """Sum-reduced InfoNCE against a full-vocabulary pool — NCL's
    structural contrast (models/NCL.py:129-142) and the CGCL loss family
    (models/CGCL.py:93-202) reduce with sum, not mean."""
    emb_1 = _normalize(_f32(emb_1))
    emb_2 = _normalize(_f32(emb_2))
    emb_all = _normalize(_f32(emb_all))
    pos_score = jnp.exp(jnp.sum(emb_1 * emb_2, axis=-1) / temperature)
    ttl_score = jnp.sum(jnp.exp(_matmul(emb_1, emb_all.T) / temperature), axis=1)
    return jnp.sum(-jnp.log(pos_score / ttl_score + _INFONCE_ALL_EPS))


def elbo_loss(
    recon_x: jnp.ndarray,
    x: jnp.ndarray,
    mu: jnp.ndarray,
    logvar: jnp.ndarray,
    anneal: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """VAE ELBO terms: (softmax CE, annealed KL) — losses.py:53-56.

    The KL term keeps the reference's double normalization
    (both ``/ B`` and a mean over the batch)."""
    recon_x, x, mu, logvar = _f32(recon_x), _f32(x), _f32(mu), _f32(logvar)
    bce = -jnp.mean(jnp.sum(jax.nn.log_softmax(recon_x, axis=1) * x, axis=-1))
    kld = -0.5 / recon_x.shape[0] * jnp.mean(
        jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar), axis=1)
    )
    return bce, anneal * kld


def align_loss(emb_1: jnp.ndarray, emb_2: jnp.ndarray) -> jnp.ndarray:
    """DirectAU alignment: mean squared distance of normalized pairs
    (losses.py:59-62)."""
    emb_1 = _normalize(_f32(emb_1))
    emb_2 = _normalize(_f32(emb_2))
    return jnp.mean(jnp.sum((emb_1 - emb_2) ** 2, axis=1))


def uniform_loss(embedding: jnp.ndarray) -> jnp.ndarray:
    """DirectAU uniformity: log E_{i<j}[exp(-2‖e_i - e_j‖²)]
    (losses.py:65-67 via torch.pdist — strictly upper-triangular pairs)."""
    e = _normalize(_f32(embedding))
    sq = jnp.sum(e * e, axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * _matmul(e, e.T)
    n = e.shape[0]
    # mean over strict-upper-triangle pairs WITHOUT a triu gather (a
    # 2-index gather of n(n-1)/2 elements dominates the whole training
    # step on TPU): exp(-2·d2) is symmetric with unit diagonal (d2_ii
    # = 0), so Σ_{i<j} = (Σ_all − n) / 2 exactly.
    total = (jnp.sum(jnp.exp(-2.0 * d2)) - n) / 2.0
    return jnp.log(total / (n * (n - 1) / 2.0))


# ---------------------------------------------------------------------------
# Model-specific loss heads kept here so every model file stays thin.


def neighbor_aggregate_loss(emb_1: jnp.ndarray, emb_2: jnp.ndarray, tau: float) -> jnp.ndarray:
    """LightCCF's neighborhood-aggregation loss (models/LightCCF.py:81-94):
    positive u·i⁺ against a denominator over both u·I_batchᵀ and
    u·U_batchᵀ."""
    emb_1 = _normalize(_f32(emb_1))
    emb_2 = _normalize(_f32(emb_2))
    pos_score = jnp.exp(jnp.sum(emb_1 * emb_2, axis=-1) / tau)
    # element-wise sum of the two similarity matrices, then exp
    total = _matmul(emb_1, emb_2.T) + _matmul(emb_1, emb_1.T)
    ttl_score = jnp.sum(jnp.exp(total / tau), axis=1)
    return jnp.mean(-jnp.log(pos_score / ttl_score + _INFONCE_EPS))


def lightcscf_loss(
    emb_1: jnp.ndarray, emb_2: jnp.ndarray, temperature: float, margin: float
) -> jnp.ndarray:
    """LightCSCF's dual-filter contrastive loss with margin-ReLU channel
    (models/LightCSCF.py:93-104)."""
    emb_1 = _normalize(_f32(emb_1))
    emb_2 = _normalize(_f32(emb_2))
    sim = jnp.sum(emb_1 * emb_2, axis=-1)
    pos_score = jnp.exp(sim / temperature) + jnp.exp(jax.nn.relu(sim - margin) / temperature)
    # element-wise sum of the two similarity matrices (LightCSCF.py:98-99)
    total = _matmul(emb_1, emb_2.T) + _matmul(emb_1, emb_1.T)
    total_score = jnp.exp(total / temperature) + jnp.exp(jax.nn.relu(total - margin) / temperature)
    ttl = jnp.sum(total_score, axis=1)
    return jnp.mean(-jnp.log(pos_score / ttl + _INFONCE_EPS))


def margin_alignment_loss(
    emb_1: jnp.ndarray, emb_2: jnp.ndarray, margin: jnp.ndarray
) -> jnp.ndarray:
    """MAWU margin-aware alignment (models/MAWU.py:63-74).

    Replicates the reference's broadcast: ``angle`` is [B] and
    ``margin`` is [B, 1] (MAWU.py:93-96), so ``angle + (1 - σ(margin))``
    is a [B, B] matrix and the mean runs over all B² entries."""
    emb_1 = _normalize(_f32(emb_1))
    emb_2 = _normalize(_f32(emb_2))
    cos = jnp.sum(emb_1 * emb_2, axis=-1)
    angle = jnp.arccos(jnp.clip(cos, -1 + 1e-7, 1 - 1e-7))
    angle = jnp.clip(angle + (1.0 - jax.nn.sigmoid(_f32(margin))), 0.0, jnp.pi)
    return -jnp.mean(jnp.cos(angle))


def dot_uniformity_loss(embeddings: jnp.ndarray, t: float = 2.0) -> jnp.ndarray:
    """MAWU weighted dot-uniformity (models/MAWU.py:76-81).

    Replicates the reference exactly, including the quirk that entries
    masked out by ``tril(·, -1)`` become 0 and still contribute
    ``exp(-2·t)`` after the ``2 - 2·cos`` shift — intended or not, that
    offset is part of the training signal being reproduced."""
    e = _normalize(_f32(embeddings))
    cos = _matmul(e, e.T)
    cos = jnp.tril(cos, k=-1)
    cos = 2.0 - 2.0 * cos
    return jnp.log(jnp.mean(jnp.exp(-t * cos)))


@partial(jax.custom_vjp, nondiff_argnums=())
def reg_loss_indexed(user_table: jnp.ndarray, item_table: jnp.ndarray,
                     u: jnp.ndarray, p: jnp.ndarray, n: jnp.ndarray
                     ) -> jnp.ndarray:
    """reg_loss(user_table[u], item_table[p], item_table[n]) with a
    scatter-free backward.

    The L2 term's gradient scatters IDENTICAL rows — every occurrence
    of table row r contributes table[r]/B — so the row scatter-add
    (measured ~0.29 ms for a 6144-row batch on v5e, ~45 ns/row of
    fixed per-row cost) collapses to a per-row COUNT times an
    elementwise table scale: d(table) = g · (count/B) ⊙ table. Scalar
    count scatters + one fused elementwise pass measure ~5x cheaper.
    Values match reg_loss(...) bit-for-bit (same forward ops); the
    backward differs from autodiff's sequential duplicate adds only
    when a row repeats >= 5 times in a batch, by f32 ulps (k·x vs
    ((x+x)+x)+... single-rounding — quantization-noise scale).
    Reference semantics anchor: losses.py:16-21."""
    return reg_loss(user_table[u], item_table[p], item_table[n])


def _reg_idx_fwd(user_table, item_table, u, p, n):
    return reg_loss_indexed(user_table, item_table, u, p, n), (
        user_table, item_table, u, p, n)


def _reg_idx_bwd(res, g):
    user_table, item_table, u, p, n = res
    bu = jnp.float32(u.shape[0])
    bi = jnp.float32(p.shape[0])
    cu = jnp.zeros((user_table.shape[0],), jnp.float32).at[u].add(1.0)
    ci = (jnp.zeros((item_table.shape[0],), jnp.float32).at[p].add(1.0 / bi)
          .at[n].add(1.0 / jnp.float32(n.shape[0])))
    du = (g * cu / bu)[:, None] * _f32(user_table)
    di = (g * ci)[:, None] * _f32(item_table)
    return (du.astype(user_table.dtype), di.astype(item_table.dtype),
            None, None, None)


reg_loss_indexed.defvjp(_reg_idx_fwd, _reg_idx_bwd)


@jax.custom_vjp
def reg_loss_counted(table: jnp.ndarray, *idxs: jnp.ndarray) -> jnp.ndarray:
    """reg_loss(table[i] for i in idxs) for ONE table — the
    scatter-free backward of reg_loss_indexed generalized to any
    number of index sets over a single table (user-only, item-only,
    or pos+neg patterns across the model zoo)."""
    return reg_loss(*(table[i] for i in idxs))


def _reg_cnt_fwd(table, *idxs):
    return reg_loss_counted(table, *idxs), (table, idxs)


def _reg_cnt_bwd(res, g):
    table, idxs = res
    c = jnp.zeros((table.shape[0],), jnp.float32)
    for i in idxs:
        c = c.at[i].add(1.0 / jnp.float32(i.shape[0]))
    d = (g * c)[:, None] * _f32(table)
    return (d.astype(table.dtype),) + (None,) * len(idxs)


reg_loss_counted.defvjp(_reg_cnt_fwd, _reg_cnt_bwd)
