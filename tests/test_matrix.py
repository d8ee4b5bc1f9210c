"""Matrix-utility tests vs scipy oracles
(parity target: /root/reference/tests/test_w2_utils.py tolerances,
STABILITY_CONST=1e-8)."""
import jax.numpy as jnp
import numpy as np
import scipy.linalg as spl

from ot_vae_tpu.ops import (
    STABILITY_CONST,
    invsqrtm,
    invsqrtm_ns,
    is_pd,
    is_spd,
    make_psd,
    mean_cov,
    min_eig,
    sqrtm,
    sqrtm_ns,
)


def _rand_spd(rng, *shape, dim):
    m = rng.standard_normal((*shape, dim, dim))
    return m @ np.swapaxes(m, -1, -2) + np.eye(dim) * 1e-5


def test_sqrtm_vs_scipy(rng):
    cov = _rand_spd(rng, 2, 3, dim=5)
    ours = np.asarray(sqrtm(jnp.asarray(cov)))
    for i in range(2):
        for j in range(3):
            oracle = spl.sqrtm(cov[i, j]).real
            np.testing.assert_allclose(ours[i, j], oracle, atol=1e-7)


def test_invsqrtm_vs_scipy(rng):
    cov = _rand_spd(rng, 4, dim=6)
    ours = np.asarray(invsqrtm(jnp.asarray(cov)))
    for i in range(4):
        oracle = np.linalg.inv(spl.sqrtm(cov[i]).real)
        np.testing.assert_allclose(ours[i], oracle, atol=1e-6)


def test_sqrtm_newton_schulz(rng):
    """MXU-friendly Newton–Schulz path agrees with the eigh path."""
    cov = _rand_spd(rng, 3, dim=8)
    ref_sqrt = np.asarray(sqrtm(jnp.asarray(cov)))
    ref_isqrt = np.asarray(invsqrtm(jnp.asarray(cov)))
    ns_sqrt = np.asarray(sqrtm_ns(jnp.asarray(cov), num_iters=30))
    ns_isqrt = np.asarray(invsqrtm_ns(jnp.asarray(cov), num_iters=30))
    # atol reflects the deliberate 1e-6 relative spectrum floor inside the
    # NS iteration (NaN-robustness for near-singular product matrices —
    # the analog of the eigh paths' eigenvalue clamp)
    np.testing.assert_allclose(ns_sqrt, ref_sqrt, atol=1e-4)
    np.testing.assert_allclose(ns_isqrt, ref_isqrt, atol=1e-3)


def test_is_pd_min_eig(rng):
    cov = _rand_spd(rng, 3, dim=4)
    assert bool(is_pd(jnp.asarray(cov)).all())
    assert bool(is_spd(jnp.asarray(cov)).all())
    neg = cov - np.eye(4) * 1e3
    assert not bool(is_pd(jnp.asarray(neg)).any())
    me = np.asarray(min_eig(jnp.asarray(cov)))
    oracle = np.array([np.linalg.eigvalsh(c).min() for c in cov])
    np.testing.assert_allclose(me, oracle, atol=1e-9)


def test_make_psd(rng):
    m = rng.standard_normal((3, 5, 5))
    m = 0.5 * (m + np.swapaxes(m, -1, -2))
    fixed, corr = make_psd(jnp.asarray(m), strict=True, return_correction=True)
    assert bool(is_pd(fixed).all())
    already = _rand_spd(rng, 2, dim=5)
    fixed2, corr2 = make_psd(jnp.asarray(already), strict=False, return_correction=True)
    np.testing.assert_allclose(np.asarray(corr2), 0.0)
    np.testing.assert_allclose(np.asarray(fixed2), already)


def test_make_psd_diag():
    v = jnp.asarray(np.array([[1.0, -2.0, 3.0], [0.5, 0.5, 0.5]]))
    fixed = make_psd(v, strict=False, diag=True)
    assert bool((fixed >= 0).all())
    np.testing.assert_allclose(np.asarray(fixed)[1], [0.5, 0.5, 0.5])


def test_streaming_mean_cov(rng):
    """Streaming (Σx, Σxxᵀ, n) covariance matches the all-at-once estimate
    (parity: /root/reference/tests/test_empirical_cov.py:24-77, tol 1e-8)."""
    from ot_vae_tpu.ops import w2_gaussian

    for dim in [64, 256]:
        n, bs = 10_000, 1000
        mean = rng.standard_normal(dim)
        m = rng.standard_normal((dim, dim))
        cov = m @ m.T
        z = rng.multivariate_normal(mean, cov, size=n)

        all_mean = z.mean(0)
        all_cov = (z - all_mean).T @ (z - all_mean) / n

        s1 = np.zeros(dim)
        s2 = np.zeros((dim, dim))
        n_obs = 0.0
        for b in range(n // bs):
            zb = z[b * bs : (b + 1) * bs]
            s1 += zb.sum(0)
            s2 += zb.T @ zb
            n_obs += len(zb)
        stream_mean, stream_cov = mean_cov(jnp.asarray(s1), jnp.asarray(s2), n_obs)

        mean_diff = np.linalg.norm(all_mean - stream_mean) / np.linalg.norm(all_mean)
        cov_diff = np.linalg.norm(all_cov - stream_cov) / np.linalg.norm(all_cov)
        w2_diff = float(
            w2_gaussian(
                jnp.asarray(all_mean), jnp.asarray(stream_mean),
                jnp.asarray(all_cov), jnp.asarray(stream_cov), make_pd=True,
            )
        )
        assert mean_diff < STABILITY_CONST
        assert cov_diff < STABILITY_CONST
        assert w2_diff < STABILITY_CONST**0.5


def test_streaming_mean_cov_diag(rng):
    z = rng.standard_normal((5000, 16))
    s1 = jnp.asarray(z.sum(0))
    s2 = jnp.asarray((z**2).sum(0))
    mean, var = mean_cov(s1, s2, len(z), diag=True)
    np.testing.assert_allclose(np.asarray(mean), z.mean(0), atol=1e-10)
    np.testing.assert_allclose(np.asarray(var), z.var(0), atol=1e-10)


def test_sqrtm_method_ns_matches_eigh_realistic_conditioning():
    """Newton-Schulz (method='ns', the TPU auto-default) vs the eigh path in
    f32 at kappa=1e4 — the conditioning regime shrinkage-stabilized transport
    covariances live in (BENCH_DETAIL.md: NS is 52x faster on TPU)."""
    import numpy as np

    from ot_vae_tpu.ops.matrix import invsqrtm, sqrtm, sqrtm_and_invsqrtm

    rng = np.random.default_rng(3)
    d = 96
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    eigs = np.geomspace(1e-4, 1.0, d)
    a = jnp.asarray((q * eigs) @ q.T, jnp.float32)

    s_ref = sqrtm(a, method="eigh")
    s_ns = sqrtm(a, method="ns")
    np.testing.assert_allclose(np.asarray(s_ns), np.asarray(s_ref),
                               atol=2e-4, rtol=1e-3)
    i_ref = invsqrtm(a, method="eigh")
    i_ns = invsqrtm(a, method="ns")
    rel = (np.linalg.norm(np.asarray(i_ns - i_ref))
           / np.linalg.norm(np.asarray(i_ref)))
    # ~0.7% at kappa=1e4: the NS spectrum floor shifts the smallest
    # eigenvalues — why invsqrtm's DEFAULT stays eigh (opt-in ns)
    assert rel < 2e-2, rel
    both = sqrtm_and_invsqrtm(a, method="ns")
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(s_ns))

    import pytest

    with pytest.raises(ValueError):
        sqrtm(a, method="cholesky")


def test_sqrtm_ns_singular_input_finite():
    """The NS sqrt is robust to exactly-singular inputs (null-space stays
    zero); the invsqrt stays finite (like the eigh path's clamped 1/sqrt(eps))
    — the degenerate-covariance probe of the transport operators."""
    import numpy as np

    from ot_vae_tpu.ops.matrix import sqrtm, sqrtm_and_invsqrtm

    d = 32
    v = np.zeros((d,), np.float32)
    v[: d // 2] = np.linspace(0.5, 2.0, d // 2)  # half the spectrum is zero
    a = jnp.asarray(np.diag(v))
    s = sqrtm(a, method="ns")
    assert np.all(np.isfinite(np.asarray(s)))
    # zero eigendirections land at sqrt(1e-6*norm) ~ 2e-3 (spectrum floor)
    np.testing.assert_allclose(np.asarray(s), np.diag(np.sqrt(v)), atol=5e-3)
    _, isq = sqrtm_and_invsqrtm(a, method="ns")
    assert np.all(np.isfinite(np.asarray(isq)))
