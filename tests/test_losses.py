import jax.numpy as jnp
import numpy as np

from idgrec_tpu.ops import losses


def _norm(x, eps=1e-12):
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, eps)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_bpr_loss(rng):
    u = rng.normal(size=(32, 8)).astype(np.float32)
    p = rng.normal(size=(32, 8)).astype(np.float32)
    n = rng.normal(size=(32, 8)).astype(np.float32)
    got = float(losses.bpr_loss(jnp.asarray(u), jnp.asarray(p), jnp.asarray(n)))
    pos = (u * p).sum(1)
    neg = (u * n).sum(1)
    want = float(np.mean(-np.log(_sigmoid(pos - neg) + 10e-8)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_reg_loss(rng):
    a = rng.normal(size=(16, 8)).astype(np.float32)
    b = rng.normal(size=(10, 8)).astype(np.float32)
    got = float(losses.reg_loss(jnp.asarray(a), jnp.asarray(b)))
    want = 0.5 * (a**2).sum() / 16 + 0.5 * (b**2).sum() / 10
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_infonce_loss(rng):
    x = rng.normal(size=(24, 8)).astype(np.float32)
    y = rng.normal(size=(24, 8)).astype(np.float32)
    tau = 0.2
    got = float(losses.infonce_loss(jnp.asarray(x), jnp.asarray(y), tau))
    xn, yn = _norm(x), _norm(y)
    pos = np.exp((xn * yn).sum(-1) / tau)
    ttl = np.exp(xn @ yn.T / tau).sum(1)
    want = float(np.mean(-np.log(pos / ttl + 10e-6)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_infonce_loss_all(rng):
    x = rng.normal(size=(12, 6)).astype(np.float32)
    y = rng.normal(size=(12, 6)).astype(np.float32)
    pool = rng.normal(size=(30, 6)).astype(np.float32)
    tau = 0.5
    got = float(losses.infonce_loss_all(jnp.asarray(x), jnp.asarray(y), jnp.asarray(pool), tau))
    xn, yn, pn = _norm(x), _norm(y), _norm(pool)
    pos = np.exp((xn * yn).sum(-1) / tau)
    ttl = np.exp(xn @ pn.T / tau).sum(1)
    want = float(np.mean(-np.log(pos / ttl + 10e-8)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_infonce_loss_sum_reduction(rng):
    x = rng.normal(size=(8, 4)).astype(np.float32)
    y = rng.normal(size=(8, 4)).astype(np.float32)
    pool = rng.normal(size=(20, 4)).astype(np.float32)
    tau = 0.1
    got = float(losses.infonce_loss_sum(jnp.asarray(x), jnp.asarray(y), jnp.asarray(pool), tau))
    xn, yn, pn = _norm(x), _norm(y), _norm(pool)
    pos = np.exp((xn * yn).sum(-1) / tau)
    ttl = np.exp(xn @ pn.T / tau).sum(1)
    want = float(np.sum(-np.log(pos / ttl + 10e-8)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_elbo_loss(rng):
    recon = rng.normal(size=(10, 20)).astype(np.float32)
    x = (rng.random((10, 20)) < 0.2).astype(np.float32)
    mu = rng.normal(size=(10, 4)).astype(np.float32)
    logvar = rng.normal(size=(10, 4)).astype(np.float32) * 0.1
    bce, kld = losses.elbo_loss(
        jnp.asarray(recon), jnp.asarray(x), jnp.asarray(mu), jnp.asarray(logvar), 0.7
    )
    logsm = recon - np.log(np.exp(recon - recon.max(1, keepdims=True)).sum(1, keepdims=True)) - recon.max(1, keepdims=True)
    want_bce = -np.mean((logsm * x).sum(-1))
    want_kld = -0.5 / 10 * np.mean((1 + logvar - mu**2 - np.exp(logvar)).sum(1))
    np.testing.assert_allclose(float(bce), want_bce, rtol=5e-4, atol=1e-5)
    np.testing.assert_allclose(float(kld), 0.7 * want_kld, rtol=5e-4, atol=1e-6)


def test_align_loss(rng):
    x = rng.normal(size=(15, 8)).astype(np.float32)
    y = rng.normal(size=(15, 8)).astype(np.float32)
    got = float(losses.align_loss(jnp.asarray(x), jnp.asarray(y)))
    xn, yn = _norm(x), _norm(y)
    want = float(np.mean(((xn - yn) ** 2).sum(1)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_uniform_loss(rng):
    x = rng.normal(size=(20, 8)).astype(np.float32)
    got = float(losses.uniform_loss(jnp.asarray(x)))
    xn = _norm(x)
    # strictly upper-triangular pairwise distances (torch.pdist semantics)
    d2 = []
    for i in range(20):
        for j in range(i + 1, 20):
            d2.append(((xn[i] - xn[j]) ** 2).sum())
    want = float(np.log(np.mean(np.exp(-2 * np.array(d2)))))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-4)


def test_neighbor_aggregate_loss(rng):
    x = rng.normal(size=(10, 6)).astype(np.float32)
    y = rng.normal(size=(10, 6)).astype(np.float32)
    tau = 0.22
    got = float(losses.neighbor_aggregate_loss(jnp.asarray(x), jnp.asarray(y), tau))
    xn, yn = _norm(x), _norm(y)
    pos = np.exp((xn * yn).sum(-1) / tau)
    ttl = np.exp((xn @ yn.T + xn @ xn.T) / tau).sum(1)
    want = float(np.mean(-np.log(pos / ttl + 10e-6)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_lightcscf_loss(rng):
    x = rng.normal(size=(9, 5)).astype(np.float32)
    y = rng.normal(size=(9, 5)).astype(np.float32)
    tau, margin = 0.2, 0.7
    got = float(losses.lightcscf_loss(jnp.asarray(x), jnp.asarray(y), tau, margin))
    xn, yn = _norm(x), _norm(y)
    sim = (xn * yn).sum(-1)
    pos = np.exp(sim / tau) + np.exp(np.maximum(sim - margin, 0) / tau)
    total = xn @ yn.T + xn @ xn.T
    ttl = (np.exp(total / tau) + np.exp(np.maximum(total - margin, 0) / tau)).sum(1)
    want = float(np.mean(-np.log(pos / ttl + 10e-6)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_margin_alignment_loss(rng):
    x = rng.normal(size=(12, 6)).astype(np.float32)
    y = rng.normal(size=(12, 6)).astype(np.float32)
    m = rng.normal(size=(12, 1)).astype(np.float32)
    got = float(losses.margin_alignment_loss(jnp.asarray(x), jnp.asarray(y), jnp.asarray(m)))
    xn, yn = _norm(x), _norm(y)
    cos = (xn * yn).sum(-1)
    ang = np.arccos(np.clip(cos, -1 + 1e-7, 1 - 1e-7))
    # reference quirk (MAWU.py:70): angle [B] + margin [B,1] broadcasts
    # to [B,B]; the mean runs over all B² entries
    ang = np.clip(ang[None, :] + (1 - _sigmoid(m)), 0, np.pi)
    want = float(-np.mean(np.cos(ang)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_dot_uniformity_loss(rng):
    x = rng.normal(size=(10, 4)).astype(np.float32)
    got = float(losses.dot_uniformity_loss(jnp.asarray(x)))
    xn = _norm(x)
    cos = np.tril(xn @ xn.T, k=-1)
    cos = 2 - 2 * cos  # masked entries contribute exp(-4), per reference
    want = float(np.log(np.mean(np.exp(-2 * cos))))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=1e-5)


def test_reg_loss_indexed_matches_reg_loss():
    """reg_loss_indexed == reg_loss(gathered rows) in value, and its
    scatter-free count-trick gradient matches autodiff's scattered
    gradient (exactly for rows repeated <= 4 times; see docstring)."""
    import jax

    from idgrec_tpu.ops import losses as L

    rng = np.random.default_rng(11)
    ut = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(70, 8)).astype(np.float32))
    u = jnp.asarray(rng.integers(0, 50, 32), jnp.int32)
    p = jnp.asarray(rng.integers(0, 70, 32), jnp.int32)
    n = jnp.asarray(rng.integers(0, 70, 32), jnp.int32)

    ref_val = L.reg_loss(ut[u], it[p], it[n])
    got_val = L.reg_loss_indexed(ut, it, u, p, n)
    assert bool(jnp.all(ref_val == got_val))

    def f_ref(ut, it):
        return L.reg_loss(ut[u], it[p], it[n])

    def f_idx(ut, it):
        return L.reg_loss_indexed(ut, it, u, p, n)

    g_ref = jax.grad(f_ref, argnums=(0, 1))(ut, it)
    g_idx = jax.grad(f_idx, argnums=(0, 1))(ut, it)
    for a, b in zip(g_ref, g_idx):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=1e-7)


def test_reg_loss_counted_matches_reg_loss():
    import jax

    from idgrec_tpu.ops import losses as L

    rng = np.random.default_rng(12)
    t = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    p = jnp.asarray(rng.integers(0, 40, 24), jnp.int32)
    n = jnp.asarray(rng.integers(0, 40, 24), jnp.int32)
    assert bool(jnp.all(L.reg_loss_counted(t, p, n) == L.reg_loss(t[p], t[n])))
    g_ref = jax.grad(lambda t: L.reg_loss(t[p], t[n]))(t)
    g_got = jax.grad(lambda t: L.reg_loss_counted(t, p, n))(t)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-6, atol=1e-7)
