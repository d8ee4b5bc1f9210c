"""W2-core tests vs independent CPU oracles.

Parity target: /root/reference/tests/test_w2_utils.py. The oracles here are
written from the published algorithms directly (scipy sqrtm for Gaussian W2,
scipy linprog for exact discrete OT, a NumPy log-domain Sinkhorn for the
entropic plan) — not ported from any repo.
"""
import jax.numpy as jnp
import numpy as np
import scipy.linalg as spl
from scipy.optimize import linprog

from ot_vae_tpu.ops import (
    STABILITY_CONST,
    apply_transport,
    batch_ot_gmm,
    batch_w2_dissimilarity_gaussian,
    batch_w2_dissimilarity_gaussian_diag,
    compute_transport_operators,
    gaussian_barycenter,
    sinkhorn_log,
    w2_gaussian,
)

_DIM = 3


def _rand_mean_cov(rng, leading, dim):
    if isinstance(leading, int):
        leading = (leading,)
    mean = rng.standard_normal((*leading, dim))
    cov = rng.standard_normal((*leading, dim, dim))
    cov = cov @ np.swapaxes(cov, -1, -2) + np.eye(dim) * 1e-5
    return mean, cov


# ---------------------------------------------------------------- oracles


def w2_gaussian_oracle(m0, m1, c0, c1):
    """Closed-form Gaussian W2² via scipy sqrtm (Gelbrich distance)."""
    s0 = spl.sqrtm(c0).real
    s010 = spl.sqrtm(s0 @ c1 @ s0).real
    return np.linalg.norm(m0 - m1) ** 2 + np.trace(c0 + c1 - 2 * s010)


def barycenter_oracle(mu, sigma, alpha, n_iter):
    """W2 barycenter fixed point (Alvarez-Esteban et al.), identity init."""
    k, d = mu.shape
    s = np.eye(d)
    for _ in range(n_iter):
        s_half = spl.sqrtm(s).real
        s = sum(alpha[j] * spl.sqrtm(s_half @ sigma[j] @ s_half).real for j in range(k))
    m = alpha @ mu
    return m, s


def exact_emd_oracle(a, b, cost):
    """Exact discrete OT plan via linear programming (scipy linprog)."""
    n, m = cost.shape
    # Row-sum and column-sum equality constraints over the flattened plan.
    a_eq = np.zeros((n + m, n * m))
    for i in range(n):
        a_eq[i, i * m : (i + 1) * m] = 1.0
    for j in range(m):
        a_eq[n + j, j::m] = 1.0
    res = linprog(
        cost.ravel(), A_eq=a_eq, b_eq=np.concatenate([a, b]), bounds=(0, None),
        method="highs",
    )
    assert res.success
    plan = res.x.reshape(n, m)
    return plan, float((plan * cost).sum())


def sinkhorn_log_oracle(a, b, cost, reg, max_iter, threshold):
    """Log-domain Sinkhorn in NumPy (Cuturi '13, log-stabilized form)."""
    from scipy.special import logsumexp

    log_a, log_b = np.log(a + STABILITY_CONST), np.log(b + STABILITY_CONST)
    cr = -cost / reg
    u, v = np.zeros_like(a), np.zeros_like(b)
    for _ in range(max_iter):
        u0, v0 = u, v
        v = log_b - logsumexp(cr + u[:, None], axis=0)
        u = log_a - logsumexp(cr + v[None, :], axis=1)
        if np.abs(u - u0).sum() + np.abs(v - v0).sum() < threshold:
            break
    return np.exp(u[:, None] + v[None, :] + cr)


# ---------------------------------------------------------------- zero tests


def test_w2_gaussian_same_yields_0(rng):
    mean, cov = _rand_mean_cov(rng, (2, 3), _DIM)
    res = np.asarray(w2_gaussian(jnp.asarray(mean), jnp.asarray(mean),
                                 jnp.asarray(cov), jnp.asarray(cov)))
    assert res.shape == (2, 3)
    np.testing.assert_allclose(res, 0.0, atol=STABILITY_CONST * _DIM)


def test_batch_w2_diag_same_yields_0(rng):
    mean, cov = _rand_mean_cov(rng, (2, 3), _DIM)
    var = np.diagonal(cov, axis1=-1, axis2=-2)
    res = np.asarray(
        batch_w2_dissimilarity_gaussian_diag(
            jnp.asarray(mean), jnp.asarray(mean), jnp.asarray(var), jnp.asarray(var)
        )
    )
    assert res.shape == (2, 3, 3)
    np.testing.assert_allclose(np.diagonal(res, axis1=-1, axis2=-2), 0.0, atol=1e-8)


def test_ot_gmm_same_yields_0(rng):
    mean, cov = _rand_mean_cov(rng, (2, 3), _DIM)
    var = np.diagonal(cov, axis1=-1, axis2=-2)
    weights = np.full((2, 3), 1 / 3)

    res, _ = batch_ot_gmm(jnp.asarray(mean), jnp.asarray(mean), jnp.asarray(var),
                          jnp.asarray(var), True, jnp.asarray(weights), None)
    assert res.shape == (2,)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-7)

    res, _ = batch_ot_gmm(jnp.asarray(mean), jnp.asarray(mean), jnp.asarray(cov),
                          jnp.asarray(cov), False, jnp.asarray(weights), None)
    np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-6)


def test_gaussian_barycenter_same(rng):
    mean, cov = _rand_mean_cov(rng, (2, 1), _DIM)
    mean = np.tile(mean, (1, 3, 1))
    cov = np.tile(cov, (1, 3, 1, 1))
    var = np.diagonal(cov, axis1=-1, axis2=-2)
    weights = np.abs(rng.standard_normal((2, 3)))
    weights /= weights.sum(-1, keepdims=True)

    mean_b, var_b = gaussian_barycenter(jnp.asarray(mean), jnp.asarray(var),
                                        jnp.asarray(weights), diag=True)
    np.testing.assert_allclose(np.asarray(mean_b), mean[:, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(var_b), var[:, 0], atol=1e-9)

    mean_b, cov_b = gaussian_barycenter(jnp.asarray(mean), jnp.asarray(cov),
                                        jnp.asarray(weights), diag=False)
    np.testing.assert_allclose(np.asarray(mean_b), mean[:, 0], atol=1e-9)
    np.testing.assert_allclose(np.asarray(cov_b), cov[:, 0], atol=1e-7)


# ---------------------------------------------------------------- oracle tests


def test_w2_gaussian_vs_scipy(rng):
    mean1, cov1 = _rand_mean_cov(rng, (2, 3), _DIM)
    mean2, cov2 = _rand_mean_cov(rng, (2, 3), _DIM)
    res = np.asarray(w2_gaussian(jnp.asarray(mean1), jnp.asarray(mean2),
                                 jnp.asarray(cov1), jnp.asarray(cov2)))
    for i in range(2):
        for j in range(3):
            oracle = w2_gaussian_oracle(mean1[i, j], mean2[i, j], cov1[i, j], cov2[i, j])
            assert abs(oracle - res[i, j]) < STABILITY_CONST


def test_full_dissimilarity_vs_scipy(rng):
    """Full-covariance pairwise dissimilarity (the reference's NaN case,
    ot_vae_lightning/ot/w2_utils.py:263) is finite and matches scipy."""
    mean1, cov1 = _rand_mean_cov(rng, (2, 4), _DIM)
    mean2, cov2 = _rand_mean_cov(rng, (2, 5), _DIM)
    d = np.asarray(batch_w2_dissimilarity_gaussian(
        jnp.asarray(mean1), jnp.asarray(mean2), jnp.asarray(cov1), jnp.asarray(cov2)))
    assert d.shape == (2, 4, 5)
    assert np.isfinite(d).all()
    for i in range(2):
        for n in range(4):
            for m in range(5):
                oracle = w2_gaussian_oracle(mean1[i, n], mean2[i, m], cov1[i, n], cov2[i, m])
                assert abs(oracle - d[i, n, m]) < 1e-6


def test_w2_barycenter_vs_scipy(rng):
    n_iter = 100
    mean, cov = _rand_mean_cov(rng, (2, 3), _DIM)
    var = np.diagonal(cov, axis1=-1, axis2=-2)
    weights = np.abs(rng.standard_normal((2, 3)))
    weights /= weights.sum(-1, keepdims=True)

    mean_b, var_b = gaussian_barycenter(jnp.asarray(mean), jnp.asarray(var),
                                        jnp.asarray(weights), diag=True)
    for i in range(2):
        m_o, s_o = barycenter_oracle(mean[i], np.stack([np.diag(v) for v in var[i]]),
                                     weights[i], n_iter)
        np.testing.assert_allclose(np.asarray(mean_b)[i], m_o, atol=1e-8)
        np.testing.assert_allclose(np.asarray(var_b)[i], np.diagonal(s_o), atol=1e-8)

    mean_b, cov_b = gaussian_barycenter(jnp.asarray(mean), jnp.asarray(cov),
                                        jnp.asarray(weights), diag=False, n_iter=n_iter)
    for i in range(2):
        m_o, s_o = barycenter_oracle(mean[i], cov[i], weights[i], n_iter)
        np.testing.assert_allclose(np.asarray(mean_b)[i], m_o, atol=1e-8)
        np.testing.assert_allclose(np.asarray(cov_b)[i], s_o, atol=1e-6)


def test_sinkhorn_vs_numpy_oracle(rng):
    cost = np.abs(rng.standard_normal((2, 3, _DIM, _DIM)))
    cost = cost + np.swapaxes(cost, -1, -2)
    a = np.abs(rng.standard_normal((2, 3, _DIM)))
    b = np.abs(rng.standard_normal((2, 3, _DIM)))
    a /= a.sum(-1, keepdims=True)
    b /= b.sum(-1, keepdims=True)

    pi = np.asarray(sinkhorn_log(jnp.asarray(a), jnp.asarray(b), jnp.asarray(cost),
                                 reg=1e-5, max_iter=1000, threshold=STABILITY_CONST))
    for i in range(2):
        for j in range(3):
            oracle = sinkhorn_log_oracle(a[i, j], b[i, j], cost[i, j],
                                         reg=1e-5, max_iter=2000, threshold=1e-12)
            np.testing.assert_allclose(pi[i, j], oracle, atol=1e-6)


def test_sinkhorn_plan_marginals(rng):
    a = np.abs(rng.standard_normal((4, 7))); a /= a.sum(-1, keepdims=True)
    b = np.abs(rng.standard_normal((4, 9))); b /= b.sum(-1, keepdims=True)
    cost = np.abs(rng.standard_normal((4, 7, 9)))
    pi = np.asarray(sinkhorn_log(jnp.asarray(a), jnp.asarray(b), jnp.asarray(cost),
                                 reg=1e-2, max_iter=5000, threshold=1e-12))
    np.testing.assert_allclose(pi.sum(-1), a, atol=1e-6)
    np.testing.assert_allclose(pi.sum(-2), b, atol=1e-6)


def test_ot_gmm_vs_exact_emd(rng):
    """Entropic GMM-OT approaches the exact LP plan at small regularization
    (parity: /root/reference/tests/test_w2_utils.py:259-302, which allows
    atol 1.0 vs POT's emd; at reg=1e-4 with full convergence our costs match
    the LP oracle to <1e-2)."""
    mean1, cov1 = _rand_mean_cov(rng, (2, 10), _DIM)
    mean2, cov2 = _rand_mean_cov(rng, (2, 20), _DIM)
    w1 = np.abs(rng.standard_normal((2, 10))); w1 /= w1.sum(-1, keepdims=True)
    w2 = np.abs(rng.standard_normal((2, 20))); w2 /= w2.sum(-1, keepdims=True)
    var1 = np.diagonal(cov1, axis1=-1, axis2=-2)
    var2 = np.diagonal(cov2, axis1=-1, axis2=-2)

    for diag in [True, False]:
        cs, ct = (var1, var2) if diag else (cov1, cov2)
        cost, coupling = batch_ot_gmm(
            jnp.asarray(mean1), jnp.asarray(mean2), jnp.asarray(cs), jnp.asarray(ct),
            diag, jnp.asarray(w1), jnp.asarray(w2), reg=1e-4, max_iter=100_000,
        )
        cost, coupling = np.asarray(cost), np.asarray(coupling)
        for i in range(2):
            pair_cost = np.zeros((10, 20))
            for k in range(10):
                for l in range(20):  # noqa: E741
                    c0 = np.diag(var1[i, k]) if diag else cov1[i, k]
                    c1 = np.diag(var2[i, l]) if diag else cov2[i, l]
                    pair_cost[k, l] = w2_gaussian_oracle(mean1[i, k], mean2[i, l], c0, c1)
            plan_o, cost_o = exact_emd_oracle(w1[i], w2[i], pair_cost)
            assert abs(cost_o - cost[i]) < 1e-2
            np.testing.assert_allclose(coupling[i], plan_o, atol=0.05)


# ---------------------------------------------------------------- transport ops


def test_transport_operators_full(rng, key):
    """T from eq.17 pushes N(μs, Σs) onto N(μt, Σt): T Σs Tᵀ == Σt."""
    _, cov_s = _rand_mean_cov(rng, (4,), 6)
    _, cov_t = _rand_mean_cov(rng, (4,), 6)
    T, Cw = compute_transport_operators(jnp.asarray(cov_s), jnp.asarray(cov_t),
                                        stochastic=False, diag=False)
    pushed = np.asarray(T @ jnp.asarray(cov_s) @ jnp.swapaxes(T, -1, -2))
    np.testing.assert_allclose(pushed, cov_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(Cw), 0.0)


def test_transport_operators_diag(rng):
    var_s = np.abs(rng.standard_normal((4, 6))) + 0.1
    var_t = np.abs(rng.standard_normal((4, 6))) + 0.1
    T, _ = compute_transport_operators(jnp.asarray(var_s), jnp.asarray(var_t),
                                       stochastic=False, diag=True)
    np.testing.assert_allclose(np.asarray(T) ** 2 * var_s, var_t, atol=1e-5)


def test_transport_operators_full_stochastic(rng):
    """Eq.19: T Σs Tᵀ + Σw == Σt (source PD case)."""
    _, cov_s = _rand_mean_cov(rng, (3,), 4)
    _, cov_t = _rand_mean_cov(rng, (3,), 4)
    T, Cw = compute_transport_operators(jnp.asarray(cov_s), jnp.asarray(cov_t),
                                        stochastic=True, diag=False)
    pushed = np.asarray(T @ jnp.asarray(cov_s) @ jnp.swapaxes(T, -1, -2) + Cw)
    np.testing.assert_allclose(pushed, cov_t, atol=1e-4)


def test_apply_transport_moments(rng, key):
    """Transported samples have the target mean/cov empirically."""
    dim = 4
    mean_s, cov_s = _rand_mean_cov(rng, (), dim)
    mean_t, cov_t = _rand_mean_cov(rng, (), dim)
    x = rng.multivariate_normal(mean_s, cov_s, size=200_000)
    T, _ = compute_transport_operators(jnp.asarray(cov_s), jnp.asarray(cov_t),
                                       stochastic=False, diag=False)
    y = np.asarray(apply_transport(jnp.asarray(x), jnp.asarray(mean_s),
                                   jnp.asarray(mean_t), T))
    emp_mean = y.mean(0)
    emp_cov = (y - emp_mean).T @ (y - emp_mean) / len(y)
    np.testing.assert_allclose(emp_mean, mean_t, atol=0.05)
    np.testing.assert_allclose(emp_cov, cov_t, atol=0.1)


def test_apply_transport_diag_and_noise(rng, key):
    dim = 5
    x = jnp.asarray(rng.standard_normal((100, dim)))
    mean_s = jnp.zeros(dim)
    mean_t = jnp.ones(dim)
    T = jnp.ones(dim) * 2.0
    Cw = jnp.ones(dim) * 0.1
    y = apply_transport(x, mean_s, mean_t, T, Cw, diag=True, key=key)
    assert y.shape == x.shape
    y_nonoise = apply_transport(x, mean_s, mean_t, T, Cw, diag=True, key=None)
    np.testing.assert_allclose(np.asarray(y_nonoise), np.asarray(2.0 * x + 1.0), atol=1e-9)
