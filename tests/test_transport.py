"""Transport operator unit tests: synthetic source/target clouds are
transported and must match the target distribution
(parity: operator behavior in /root/reference/ot_vae_lightning/ot/transport/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ot_vae_tpu.transport import DiscreteTransport, GaussianTransport, GMMTransport


def _fit_moments(x):
    mean = x.mean(0)
    cov = (x - mean).T @ (x - mean) / len(x)
    return mean, cov


def test_gaussian_transport_full(rng, key):
    dim = 8
    a = rng.standard_normal((dim, dim))
    cov_t = a @ a.T / dim + np.eye(dim) * 0.1
    src = rng.multivariate_normal(np.ones(dim) * 2, 0.2 * np.eye(dim), 4000)
    tgt = rng.multivariate_normal(-np.ones(dim), cov_t, 4000)

    op = GaussianTransport((), dim, diag=False, dtype=jnp.float64)
    state = op.init()
    for i in range(4):
        state = op.update(
            state,
            source_samples=jnp.asarray(src[i * 1000 : (i + 1) * 1000]),
            target_samples=jnp.asarray(tgt[i * 1000 : (i + 1) * 1000]),
        )
    state, cost = op.compute(state)
    assert float(cost) > 1.0  # distributions genuinely differ

    moved = np.asarray(op.transport(state, jnp.asarray(src)))
    m, c = _fit_moments(moved)
    mt, ct = _fit_moments(tgt)
    np.testing.assert_allclose(m, mt, atol=0.15)
    np.testing.assert_allclose(c, ct, atol=0.3)


def test_gaussian_transport_diag_leading(rng, key):
    """Per-position operators (leading shape) with trailing batch dim
    (reference: gaussian_transport.py:80-95)."""
    L, dim = 4, 6
    op = GaussianTransport((L,), dim, diag=True, dtype=jnp.float64)
    state = op.init()
    src = rng.standard_normal((L, 2000, dim)) * 0.5 + 2.0
    tgt = rng.standard_normal((L, 2000, dim)) * 2.0 - 1.0
    state = op.update(state, jnp.asarray(src), jnp.asarray(tgt))
    state, cost = op.compute(state)
    assert cost.shape == (L,)
    moved = np.asarray(op.transport(state, jnp.asarray(src)))
    assert moved.shape == src.shape
    np.testing.assert_allclose(moved.mean(1), tgt.mean(1), atol=0.2)
    np.testing.assert_allclose(moved.std(1), tgt.std(1), atol=0.2)


def test_gmm_transport_argmax(rng, key):
    """Two shifted mixtures; transported samples must land on the target
    components (reference: gmm_transport.py:81-121)."""
    dim, K = 2, 4
    centers = np.array([[4, 4], [4, -4], [-4, 4], [-4, -4]], np.float64)
    comp = rng.integers(0, K, 4000)
    src = centers[comp] + rng.standard_normal((4000, dim)) * 0.3 + 10.0
    tgt = centers[rng.integers(0, K, 4000)] + rng.standard_normal((4000, dim)) * 0.3

    op = GMMTransport((), dim, n_components=K, diag=True, transport_type="argmax",
                      kmeans_iter=50, dtype=jnp.float64)
    state = op.init(key)
    state = op.update(state, jnp.asarray(src), jnp.asarray(tgt), key)
    state, cost = op.compute(state, key=key)
    moved = np.asarray(op.transport(state, jnp.asarray(src), key))
    # every moved point is near one of the target centers
    d = np.linalg.norm(moved[:, None, :] - centers[None], axis=-1).min(1)
    assert np.quantile(d, 0.95) < 1.5


def test_gmm_transport_barycenter(rng, key):
    dim, K = 2, 3
    src = rng.standard_normal((2000, dim)) + 5.0
    tgt = rng.standard_normal((2000, dim)) * 0.5
    op = GMMTransport((), dim, n_components=K, diag=True,
                      transport_type="barycenter", kmeans_iter=20, dtype=jnp.float64)
    state = op.init(key)
    state = op.update(state, jnp.asarray(src), jnp.asarray(tgt), key)
    state, _ = op.compute(state, key=key)
    moved = np.asarray(op.transport(state, jnp.asarray(src), key))
    assert np.linalg.norm(moved.mean(0) - tgt.mean(0)) < 0.5


@pytest.mark.parametrize("transport_type", ["mean", "argmax", "sample"])
def test_discrete_transport(rng, key, transport_type):
    """(reference: discrete_transport.py:70-95)"""
    dim, K = 4, 8
    src_atoms = rng.standard_normal((K, dim)) * 3 + 6
    tgt_atoms = rng.standard_normal((K, dim)) * 3 - 6
    src = src_atoms[rng.integers(0, K, 3000)] + rng.standard_normal((3000, dim)) * 0.1
    tgt = tgt_atoms[rng.integers(0, K, 3000)] + rng.standard_normal((3000, dim)) * 0.1

    op = DiscreteTransport((), dim, n_components=K, transport_type=transport_type,
                           kmeans_iter=30, dtype=jnp.float64)
    state = op.init(key)
    state = op.update(state, jnp.asarray(src), jnp.asarray(tgt), key)
    state, cost = op.compute(state, key=key)
    assert float(cost) > 0
    moved = np.asarray(op.transport(state, jnp.asarray(src[:500]), key))
    # moved points sit near target atoms ('mean' mode legitimately
    # interpolates where the OT plan splits mass between atoms — unequal
    # cluster weights force splits — so only the median is checked there)
    d = np.linalg.norm(moved[:, None, :] - np.asarray(state.target.codebook)[None],
                       axis=-1).min(1)
    if transport_type == "mean":
        assert np.quantile(d, 0.5) < 1.0
        # interpolated outputs stay within the target atoms' spread
        spread = np.linalg.norm(tgt_atoms - tgt_atoms.mean(0), axis=-1).max()
        assert d.max() < 2 * spread
    else:
        assert np.quantile(d, 0.9) < 1.0


def test_operator_reset(rng, key):
    op = GaussianTransport((), 4, dtype=jnp.float64)
    state = op.init()
    state = op.update(state, source_samples=jnp.asarray(rng.standard_normal((100, 4))))
    assert float(state.source.n) == 100
    state = op.reset(state, key)
    assert float(state.source.n) == 0
