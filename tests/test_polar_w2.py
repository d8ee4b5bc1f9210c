"""Polar-factor W2 pipeline: matmul-only ("polar") paths vs the eigh oracle.

The ``method="polar"`` reformulation (ops/w2.py:_polar_path) exists so the
TPU can run the whole Bures/Monge math on the MXU. These tests force the
polar path on CPU and pin it against the eigh pipeline — which is itself
oracle-tested against scipy/POT (tests/test_matrix.py, tests/test_w2.py) —
including the adversarial inputs that made plain Newton–Schulz *sqrtm*
unsafe as a default (indefinite product matrices; ops/matrix.py:_use_ns).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ot_vae_tpu.ops import (
    apply_transport,
    batch_w2_dissimilarity_gaussian,
    bures_sqrt_trace,
    compute_transport_operators,
    gaussian_barycenter,
    polar,
    psd_projection,
    sqrtm_ns,
    w2_gaussian,
)


def _rand_spd(rng, *shape, dim, cond=1e2):
    """SPD batch with controlled condition number."""
    q, _ = np.linalg.qr(rng.standard_normal((*shape, dim, dim)))
    lams = np.logspace(0, -np.log10(cond), dim)
    lams = lams * (0.5 + rng.random((*shape, dim)))
    return np.einsum("...ij,...j,...kj->...ik", q, lams, q)


# --------------------------------------------------------------------- polar


def test_polar_factor_properties(rng):
    m = rng.standard_normal((3, 12, 12))
    u = np.asarray(polar(jnp.asarray(m)))
    eye = np.eye(12)
    # orthogonal
    np.testing.assert_allclose(u @ np.swapaxes(u, -1, -2), np.broadcast_to(eye, u.shape), atol=1e-6)
    # H = UᵀM symmetric PSD, and U @ H reconstructs M
    h = np.swapaxes(u, -1, -2) @ m
    np.testing.assert_allclose(h, np.swapaxes(h, -1, -2), atol=1e-5)
    assert np.linalg.eigvalsh(0.5 * (h + np.swapaxes(h, -1, -2))).min() > -1e-6
    np.testing.assert_allclose(u @ h, m, atol=1e-5)


def test_polar_scale_invariance_and_small_singulars(rng):
    m = rng.standard_normal((10, 10))
    u1 = np.asarray(polar(jnp.asarray(m)))
    u2 = np.asarray(polar(jnp.asarray(m * 1e4)))
    np.testing.assert_allclose(u1, u2, atol=1e-6)

    # tiny-but-nonzero singular values still converge to 1 (the quintic lift
    # phase exists exactly for this); svals spread over 6 orders of magnitude
    q1, _ = np.linalg.qr(rng.standard_normal((16, 16)))
    q2, _ = np.linalg.qr(rng.standard_normal((16, 16)))
    s = np.logspace(0, -6, 16)
    m = q1 @ np.diag(s) @ q2.T
    u = np.asarray(polar(jnp.asarray(m)))
    np.testing.assert_allclose(u @ u.T, np.eye(16), atol=1e-4)
    np.testing.assert_allclose(u, q1 @ q2.T, atol=1e-4)


def test_polar_rank_deficient_annihilates_null_space(rng):
    # exact zeros stay exactly zero (odd-polynomial iteration): pseudo-polar
    q1, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    q2, _ = np.linalg.qr(rng.standard_normal((8, 8)))
    s = np.array([2.0, 1.5, 1.0, 0.5, 0.1, 0.0, 0.0, 0.0])
    m = q1 @ np.diag(s) @ q2.T
    u = np.asarray(polar(jnp.asarray(m)))
    assert np.all(np.isfinite(u))
    # U has the same row/column space as M: null directions map to ~0
    null_vecs = q2[:, 5:]  # right-singular vectors of the zero block
    np.testing.assert_allclose(u @ null_vecs, np.zeros((8, 3)), atol=1e-5)
    # and on the range it matches the exact polar factor
    np.testing.assert_allclose(u, q1 @ np.diag(s > 0).astype(float) @ q2.T, atol=1e-4)


def test_make_psd_polar_method(rng):
    """make_psd(method='polar'): matmul-only diagonal shift — PSD output,
    ~|λmin| correction (exact when one eigenvalue is negative), ≈no-op on
    PSD input. Used by the streaming fit/update paths on TPU."""
    from ot_vae_tpu.ops import make_psd

    q, _ = np.linalg.qr(rng.standard_normal((10, 10)))
    lam = np.linspace(1.0, 0.05, 10)
    lam[-1] = -3e-2
    a = q @ np.diag(lam) @ q.T
    fixed, corr = make_psd(jnp.asarray(a), return_correction=True,
                           method="polar")
    assert np.linalg.eigvalsh(np.asarray(fixed)).min() > -1e-8
    np.testing.assert_allclose(float(corr), 3e-2, rtol=1e-3)  # single neg eig

    spd = q @ np.diag(np.abs(lam)) @ q.T
    out = make_psd(jnp.asarray(spd), method="polar")
    np.testing.assert_allclose(np.asarray(out), spd, atol=1e-5)

    with pytest.raises(ValueError):
        make_psd(jnp.eye(4), method="svd")


def test_psd_projection_clamps_negative_eigenvalues(rng):
    q, _ = np.linalg.qr(rng.standard_normal((12, 12)))
    lam = np.linspace(1.0, 0.01, 12)
    lam[-1] = -1e-2
    a = q @ np.diag(lam) @ q.T
    p = np.asarray(psd_projection(jnp.asarray(a)))
    w = np.linalg.eigvalsh(p)
    assert w.min() > -1e-6  # negative eigenvalue clamped (to round-off)
    # positive spectrum untouched
    np.testing.assert_allclose(np.sort(w)[1:], np.sort(lam[:-1]), atol=1e-5)
    # PSD input is (numerically) a fixed point
    spd = q @ np.diag(np.abs(lam)) @ q.T
    np.testing.assert_allclose(np.asarray(psd_projection(jnp.asarray(spd))),
                               spd, atol=1e-6)


# ------------------------------------------------------------ bures trace/W2


@pytest.mark.parametrize("cond", [1e1, 1e4])
def test_bures_trace_polar_vs_eigh(rng, cond):
    a = jnp.asarray(_rand_spd(rng, 4, dim=24, cond=cond))
    b = jnp.asarray(_rand_spd(rng, 4, dim=24, cond=cond))
    t_eigh = np.asarray(bures_sqrt_trace(a, b, method="eigh"))
    t_polar = np.asarray(bures_sqrt_trace(a, b, method="polar"))
    np.testing.assert_allclose(t_polar, t_eigh, rtol=2e-3)


def test_w2_gaussian_polar_vs_eigh(rng):
    d = 16
    mean_s = jnp.asarray(rng.standard_normal((5, d)))
    mean_t = jnp.asarray(rng.standard_normal((5, d)))
    cov_s = jnp.asarray(_rand_spd(rng, 5, dim=d, cond=1e3))
    cov_t = jnp.asarray(_rand_spd(rng, 5, dim=d, cond=1e3))
    w_eigh = np.asarray(w2_gaussian(mean_s, mean_t, cov_s, cov_t, method="eigh"))
    w_polar = np.asarray(w2_gaussian(mean_s, mean_t, cov_s, cov_t, method="polar"))
    # W2² is O(‖μs−μt‖² + tr) ≳ 1 here; the polar path carries the NS sqrtm
    # relative ridge (~1e-6·‖C‖F) — tolerance derived from that floor
    np.testing.assert_allclose(w_polar, w_eigh, rtol=5e-3, atol=5e-3)


def test_batch_dissimilarity_polar_vs_eigh(rng):
    d, n, m = 8, 5, 7
    mean_s = jnp.asarray(rng.standard_normal((n, d)))
    mean_t = jnp.asarray(rng.standard_normal((m, d)))
    cov_s = jnp.asarray(_rand_spd(rng, n, dim=d))
    cov_t = jnp.asarray(_rand_spd(rng, m, dim=d))
    d_eigh = np.asarray(batch_w2_dissimilarity_gaussian(
        mean_s, mean_t, cov_s, cov_t, method="eigh"))
    d_polar = np.asarray(batch_w2_dissimilarity_gaussian(
        mean_s, mean_t, cov_s, cov_t, method="polar"))
    assert d_eigh.shape == d_polar.shape == (n, m)
    np.testing.assert_allclose(d_polar, d_eigh, rtol=5e-3, atol=5e-3)


# ------------------------------------------------------- transport operators


@pytest.mark.parametrize("stochastic", [False, True])
def test_transport_operators_polar_vs_eigh(rng, stochastic):
    d = 12
    cov_s = jnp.asarray(_rand_spd(rng, 3, dim=d, cond=1e3))
    cov_t = jnp.asarray(_rand_spd(rng, 3, dim=d, cond=1e3))
    T_e, Cw_e = compute_transport_operators(
        cov_s, cov_t, stochastic=stochastic, diag=False, method="eigh")
    T_p, Cw_p = compute_transport_operators(
        cov_s, cov_t, stochastic=stochastic, diag=False, method="polar")
    np.testing.assert_allclose(np.asarray(T_p), np.asarray(T_e), rtol=5e-3, atol=5e-3)

    # the maps must agree where it matters: on transported samples
    x = jnp.asarray(rng.standard_normal((3, 20, d)))
    mu = jnp.zeros((3, 1, d))
    y_e = np.asarray(apply_transport(x, mu, mu, T_e[:, None], diag=False))
    y_p = np.asarray(apply_transport(x, mu, mu, T_p[:, None], diag=False))
    np.testing.assert_allclose(y_p, y_e, rtol=1e-2, atol=1e-2)
    if stochastic:
        # noise covariances agree and are PSD-admissible in both modes
        np.testing.assert_allclose(np.asarray(Cw_p), np.asarray(Cw_e),
                                   rtol=2e-2, atol=2e-2)
        # the NOISE path (sqrtm of Cw at apply time) also matches: same key
        # → same eps, so the only difference is the scale factorization
        k = jax.random.PRNGKey(7)
        n_e = np.asarray(apply_transport(x, mu, mu, T_e[:, None],
                                         Cw_e[:, None], key=k, method="eigh"))
        n_p = np.asarray(apply_transport(x, mu, mu, T_p[:, None],
                                         Cw_p[:, None], key=k, method="polar"))
        assert np.all(np.isfinite(n_p))
        np.testing.assert_allclose(n_p, n_e, rtol=5e-2, atol=5e-2)


def test_transport_polar_degenerate_zero_variance(rng):
    """The paid-off probe (verify skill): exactly-zero variance directions.

    Entrywise T agreement is NOT the right assertion here — in dead source
    directions both pipelines amplify by an arbitrary ridge-dependent factor
    (eigh: 1/√STABILITY_CONST; polar: its NS ridge scale), so the operators
    legitimately differ there. What must hold: finite outputs, and the
    transported distribution matches the target comparably well."""
    d = 8
    base = _rand_spd(rng, dim=d)
    proj = np.eye(d)
    proj[d - 2:, d - 2:] = 0.0  # kill the last two directions
    cov_s_np = proj @ base @ proj
    cov_s = jnp.asarray(cov_s_np)  # rank d-2 PSD
    cov_t_np = _rand_spd(rng, dim=d)
    cov_t = jnp.asarray(cov_t_np)
    # samples exactly from the degenerate source
    L = np.linalg.cholesky(cov_s_np + 1e-12 * np.eye(d))
    x = rng.standard_normal((20000, d)) @ L.T
    mu = jnp.zeros((1, d))
    for stochastic in (False, True):
        errs = {}
        for method in ("eigh", "polar"):
            T, Cw = compute_transport_operators(
                cov_s[None], cov_t[None], stochastic=stochastic, diag=False,
                method=method)
            assert np.all(np.isfinite(np.asarray(T)))
            assert np.all(np.isfinite(np.asarray(Cw)))
            y = np.asarray(apply_transport(jnp.asarray(x), mu, mu, T, diag=False))
            # transported covariance vs target, dead directions excluded
            # (no affine map can create variance there without noise)
            cy = np.cov(y.T)
            live = slice(0, d - 2)
            errs[method] = np.linalg.norm(
                (cy - cov_t_np)[live, live]) / np.linalg.norm(cov_t_np[live, live])
        # polar matches the target as well as eigh does (small slack for the
        # differing ridge scales)
        assert errs["polar"] < errs["eigh"] + 0.05, errs


def test_barycenter_polar_vs_eigh(rng):
    d, n = 10, 4
    mean = jnp.asarray(rng.standard_normal((n, d)))
    cov = jnp.asarray(_rand_spd(rng, n, dim=d))
    w = jnp.asarray(np.full((n,), 1.0 / n))
    m_e, c_e = gaussian_barycenter(mean, cov, w, diag=False, n_iter=50, method="eigh")
    m_p, c_p = gaussian_barycenter(mean, cov, w, diag=False, n_iter=50, method="polar")
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_e), atol=1e-12)
    np.testing.assert_allclose(np.asarray(c_p), np.asarray(c_e), rtol=5e-3, atol=5e-3)


# ------------------------------------------------ why this path exists at all


def test_polar_survives_where_ns_sqrtm_diverges(rng):
    """The input class that keeps eigh the *sqrtm* default (ops/matrix.py:
    _use_ns): numerically indefinite product matrices. NS sqrtm diverges on
    them; the polar path never forms the product, so the same W2 computation
    stays finite and accurate."""
    d = 16
    # a symmetric matrix with a small NEGATIVE eigenvalue — the shape of
    # √Ct·Cs·√Ct after upstream f32/NS error
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    lams = np.linspace(1.0, 0.01, d)
    lams[-1] = -1e-3
    indefinite = q @ np.diag(lams) @ q.T
    ns = np.asarray(sqrtm_ns(jnp.asarray(np.float32(indefinite))))
    assert not np.all(np.isfinite(ns))  # documented failure mode

    # polar path on the COVARIANCES (which are genuinely PSD) is immune
    cov_s = jnp.asarray(_rand_spd(rng, dim=d, cond=1e4))
    cov_t = jnp.asarray(_rand_spd(rng, dim=d, cond=1e4))
    t_polar = np.asarray(bures_sqrt_trace(cov_s[None], cov_t[None], method="polar"))
    t_eigh = np.asarray(bures_sqrt_trace(cov_s[None], cov_t[None], method="eigh"))
    assert np.all(np.isfinite(t_polar))
    np.testing.assert_allclose(t_polar, t_eigh, rtol=2e-3)


def test_polar_pipeline_float32(rng):
    """f32 is the TPU production dtype (x64 is test-only): pin the polar
    path's f32 accuracy vs the f64 eigh oracle on the same inputs."""
    d = 24
    cov_s64 = _rand_spd(rng, 4, dim=d, cond=1e4)
    cov_t64 = _rand_spd(rng, 4, dim=d, cond=1e4)
    t_oracle = np.asarray(bures_sqrt_trace(
        jnp.asarray(cov_s64), jnp.asarray(cov_t64), method="eigh"))
    t_f32 = np.asarray(bures_sqrt_trace(
        jnp.asarray(cov_s64, jnp.float32), jnp.asarray(cov_t64, jnp.float32),
        method="polar"))
    np.testing.assert_allclose(t_f32, t_oracle, rtol=5e-3)

    T32, _ = compute_transport_operators(
        jnp.asarray(cov_s64, jnp.float32), jnp.asarray(cov_t64, jnp.float32),
        stochastic=False, diag=False, method="polar")
    T64, _ = compute_transport_operators(
        jnp.asarray(cov_s64), jnp.asarray(cov_t64),
        stochastic=False, diag=False, method="eigh")
    assert T32.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(T32), np.asarray(T64),
                               rtol=2e-2, atol=2e-2)


def test_method_validation():
    with pytest.raises(ValueError):
        w2_gaussian(jnp.zeros(2), jnp.zeros(2), jnp.eye(2), jnp.eye(2),
                    method="qr")
