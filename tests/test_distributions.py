"""Statistical recovery tests: fit each distribution model on draws from a
known ground truth and assert W2(model, gt) < 0.1
(parity: /root/reference/tests/test_distribution_models.py:122-212, _TOL=1e-1).

Also exercises the multi-device psum path over the 8-device CPU mesh via
shard_map — distributed statistic reduction the reference never tests
(SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ot_vae_tpu.distributions import (
    CodebookModel,
    GaussianModel,
    GaussianParams,
    GMMModel,
    GMMParams,
)
from ot_vae_tpu.parallel import AxisComm

_SAMPLE_SIZE = 10_000
_DIM = 32
_LEAD = (2,)
_TOL = 1e-1
_N_COMP = 16


def _rand_mean_cov(rng, *shape, diag=False):
    mean = rng.standard_normal(shape)
    cov = rng.standard_normal((*shape, shape[-1]))
    cov = cov @ np.swapaxes(cov, -1, -2) / _DIM + np.eye(shape[-1]) * 1e-5
    if diag:
        cov = np.diagonal(cov, axis1=-1, axis2=-2)
    return mean, cov


def _gaussian_samples(rng, mean, cov, n):
    """[*L, n, D] draws from N(mean, cov) (cov full or diag)."""
    diag = mean.shape == cov.shape
    if diag:
        eps = rng.standard_normal((*mean.shape[:-1], n, mean.shape[-1]))
        return mean[..., None, :] + eps * np.sqrt(cov)[..., None, :]
    chol = np.linalg.cholesky(cov)
    eps = rng.standard_normal((*mean.shape[:-1], n, mean.shape[-1]))
    return mean[..., None, :] + np.einsum("...ij,...bj->...bi", chol, eps)


def _mixture_samples(rng, mean, cov, n):
    """[*L, n, D] draws from a uniform mixture over components [*L, K, D]."""
    K = mean.shape[-2]
    comp = rng.integers(0, K, size=(*mean.shape[:-2], n))
    comp_oh = np.eye(K)[comp]  # [*L, n, K]
    sel_mean = comp_oh @ mean
    diag = mean.shape == cov.shape
    if diag:
        sel_var = comp_oh @ cov
        eps = rng.standard_normal(sel_mean.shape)
        return sel_mean + eps * np.sqrt(sel_var)
    chol = np.linalg.cholesky(cov)  # [*L, K, D, D]
    sel_chol = np.einsum("...bk,...kij->...bij", comp_oh, chol)
    eps = rng.standard_normal(sel_mean.shape)
    return sel_mean + np.einsum("...bij,...bj->...bi", sel_chol, eps)


# ---------------------------------------------------------------- Gaussian


@pytest.mark.parametrize("diag", [True, False])
def test_gaussian_fit_and_update(rng, diag):
    mean, cov = _rand_mean_cov(rng, *_LEAD, _DIM, diag=diag)
    samples = jnp.asarray(_gaussian_samples(rng, mean, cov, _SAMPLE_SIZE))
    gt = GaussianParams(jnp.asarray(mean), jnp.asarray(cov))
    model = GaussianModel(_LEAD, _DIM, diag=diag, dtype=jnp.float64)

    # one-shot fit
    params = model.fit(model.init(), samples)
    assert float(model.w2(params, gt).max()) < _TOL

    # streaming update in batches of 100, then finalize
    state = model.init()
    update = jax.jit(model.update)
    for i in range(_SAMPLE_SIZE // 100):
        state = update(state, samples[..., i * 100 : (i + 1) * 100, :])
    params = model.fit(state)
    assert float(model.w2(params, gt).max()) < _TOL

    # log_prob sanity vs scipy
    from scipy.stats import multivariate_normal

    lp = np.asarray(model.log_prob(gt, samples[..., :5, :]))
    for li in range(_LEAD[0]):
        c = np.diag(cov[li]) if diag else cov[li]
        oracle = multivariate_normal(mean[li], c).logpdf(np.asarray(samples)[li, :5])
        np.testing.assert_allclose(lp[li], oracle, rtol=1e-6)


@pytest.mark.parametrize("diag", [True, False])
def test_gaussian_autograd(rng, key, diag):
    """SGD fitting through the unconstrained Cholesky parametrization
    (parity: reference _autograd mode, test_distribution_models.py:152-168)."""
    mean, cov = _rand_mean_cov(rng, *_LEAD, _DIM, diag=diag)
    samples = jnp.asarray(_gaussian_samples(rng, mean, cov, _SAMPLE_SIZE))
    gt = GaussianParams(jnp.asarray(mean), jnp.asarray(cov))
    model = GaussianModel(_LEAD, _DIM, diag=diag, dtype=jnp.float64)

    epochs, bs = 10, 100
    trainable = model.init_trainable(key)
    sched = optax.cosine_decay_schedule(0.1, epochs * _SAMPLE_SIZE // bs, 1e-4)
    opt = optax.adamw(sched, b1=0.0, b2=0.99, weight_decay=1e-2)
    opt_state = opt.init(trainable)

    @jax.jit
    def step(trainable, opt_state, batch):
        loss, grads = jax.value_and_grad(model.nll)(trainable, batch)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    for epoch in range(epochs):
        for i in range(_SAMPLE_SIZE // bs):
            batch = samples[..., i * bs : (i + 1) * bs, :]
            trainable, opt_state, _ = step(trainable, opt_state, batch)

    params = model.constrain(trainable)
    assert float(model.w2(params, gt).max()) < _TOL


def test_gaussian_update_multidevice(rng):
    """psum'd streaming stats over an 8-device mesh equal the single-device
    fit on the full data (the DDPMixin seam, never tested in the reference)."""
    n_dev = 8
    mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
    mean, cov = _rand_mean_cov(rng, _DIM)
    samples = jnp.asarray(_gaussian_samples(rng, mean, cov, 1600))  # [1600, D]
    model = GaussianModel((), _DIM, dtype=jnp.float64)

    comm = AxisComm("data")

    def sharded_update(state, batch):
        return model.update(state, batch, comm=comm)

    upd = shard_map(
        sharded_update, mesh=mesh,
        in_specs=(P(), P("data")), out_specs=P(),
    )
    state = jax.jit(upd)(model.init(), samples)
    params_sharded = model.fit(state)

    params_single = model.fit(model.init(), samples)
    np.testing.assert_allclose(
        np.asarray(params_sharded.mean), np.asarray(params_single.mean), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(params_sharded.cov), np.asarray(params_single.cov), atol=1e-9
    )


# ---------------------------------------------------------------- GMM


@pytest.mark.parametrize("diag", [True, False])
def test_gmm_fit(rng, key, diag):
    # NOTE: means are scaled ×4 so components are genuinely separable — this
    # makes the recovery test honest. The reference's version draws heavily
    # overlapping components and only "passes" because its Sinkhorn-based W2
    # stops after any batch element converges (see sinkhorn_log docstring),
    # under-reporting the cost.
    mean, cov = _rand_mean_cov(rng, *_LEAD, _N_COMP, _DIM, diag=diag)
    mean = mean * 4.0
    samples = jnp.asarray(_mixture_samples(rng, mean, cov, _SAMPLE_SIZE))
    gt = GMMParams(
        jnp.asarray(mean), jnp.asarray(cov),
        jnp.full((*_LEAD, _N_COMP), 1.0 / _N_COMP),
    )
    model = GMMModel(_LEAD, _DIM, n_components=_N_COMP, diag=diag,
                     kmeans_iter=100, dtype=jnp.float64)
    state = model.fit(model.init(key), samples, key=key)
    w2 = model.w2(model.params(state), gt)
    # perfect recovery ≈ per-component estimation error (~0.1 with 625
    # samples/component in 32-dim); a single merged pair costs 30+.
    assert float(w2.max()) < 5 * _TOL


@pytest.mark.parametrize("diag", [True])
def test_gmm_streaming_update(rng, key, diag):
    mean, cov = _rand_mean_cov(rng, *_LEAD, _N_COMP, _DIM, diag=diag)
    mean = mean * 4.0  # separable components (see test_gmm_fit note)
    samples = jnp.asarray(_mixture_samples(rng, mean, cov, _SAMPLE_SIZE))
    gt = GMMParams(
        jnp.asarray(mean), jnp.asarray(cov),
        jnp.full((*_LEAD, _N_COMP), 1.0 / _N_COMP),
    )
    model = GMMModel(_LEAD, _DIM, n_components=_N_COMP, diag=diag, dtype=jnp.float64)
    state = model.init(key)
    update = jax.jit(model.update)
    k = key
    for i in range(_SAMPLE_SIZE // 100):
        k, sk = jax.random.split(k)
        state = update(state, samples[..., i * 100 : (i + 1) * 100, :], sk)
    state = model.fit(state)
    assert float(model.w2(model.params(state), gt).max()) < 10 * _TOL


def test_gmm_assign_modes(rng, key):
    """Every assignment mode produces valid weights (parity: reference mode
    sweep, test_distribution_models.py:180-188)."""
    mean, cov = _rand_mean_cov(rng, _N_COMP, _DIM, diag=True)
    model = GMMModel((), _DIM, n_components=_N_COMP, diag=True, dtype=jnp.float64)
    params = GMMParams(jnp.asarray(mean), jnp.asarray(cov),
                       jnp.full((_N_COMP,), 1.0 / _N_COMP))
    x = jnp.asarray(rng.standard_normal((64, _DIM)))
    for mode in ["mean", "sample", "argmax", "gumbel-softmax", "gumbel-hardmax"]:
        m = GMMModel((), _DIM, n_components=_N_COMP, diag=True,
                     training_mode=mode, dtype=jnp.float64)
        a = m.assign(params, x, key)
        w = np.asarray(a.weights)
        assert w.shape == (64, _N_COMP)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-6)
        assert a.indices.shape == (64,)


def test_gmm_autograd(rng, key):
    mean, cov = _rand_mean_cov(rng, 4, 2, diag=True)
    mean = mean * 4  # separate the components
    samples = jnp.asarray(_mixture_samples(rng, mean, cov, 5000))
    gt = GMMParams(jnp.asarray(mean), jnp.asarray(cov), jnp.full((4,), 0.25))
    model = GMMModel((), 2, n_components=4, diag=True, dtype=jnp.float64)

    trainable = model.init_trainable(key)
    sched = optax.cosine_decay_schedule(0.1, 20 * 50, 1e-4)
    opt = optax.adamw(sched, b1=0.0, b2=0.99, weight_decay=1e-2)
    opt_state = opt.init(trainable)

    @jax.jit
    def step(trainable, opt_state, batch):
        loss, grads = jax.value_and_grad(model.nll)(trainable, batch)
        updates, opt_state = opt.update(grads, opt_state, trainable)
        return optax.apply_updates(trainable, updates), opt_state, loss

    for epoch in range(20):
        for i in range(50):
            trainable, opt_state, _ = step(
                trainable, opt_state, samples[i * 100 : (i + 1) * 100]
            )
    assert float(model.w2(model.constrain(trainable), gt).max()) < 1.0


# ---------------------------------------------------------------- Codebook


def test_codebook_streaming(rng, key):
    """Streaming k-means recovers the mixture atoms
    (parity: reference test_codebook_model, test_distribution_models.py:192-212)."""
    mean, cov = _rand_mean_cov(rng, *_LEAD, _N_COMP, _DIM)
    mean = mean * 4.0  # separable atoms (see test_gmm_fit note)
    samples = jnp.asarray(_mixture_samples(rng, mean, cov, _SAMPLE_SIZE))
    model = CodebookModel(_LEAD, _DIM, n_components=_N_COMP, dtype=jnp.float64)
    gt_state = model.init(key).replace(
        codebook=jnp.asarray(mean),
        n_obs=jnp.ones((*_LEAD, _N_COMP)),
        initialized=jnp.asarray(True),
    )

    state = model.init(key)
    update = jax.jit(model.update)
    k = key
    for i in range(_SAMPLE_SIZE // 100):
        k, sk = jax.random.split(k)
        state = update(state, samples[..., i * 100 : (i + 1) * 100, :], sk)
    state = model.fit(state)
    # codebook w2 cost ≈ matched atom distance ≈ mean-estimation error
    assert float(model.w2(state, gt_state).max()) < 5 * _TOL


def test_codebook_predict_and_sample(rng, key):
    model = CodebookModel((), 8, n_components=4, dtype=jnp.float64)
    state = model.init(key)
    x = jnp.asarray(rng.standard_normal((32, 8)))
    state = model.update(state, x, key)
    preds, assignment = model.predict(state, x, key)
    assert preds.shape == (32, 8)
    assert assignment.indices.shape == (32,)
    draws = model.sample(state, key, 16)
    assert draws.shape == (16, 8)
    # every draw is a codebook atom
    dists = np.linalg.norm(
        np.asarray(draws)[:, None, :] - np.asarray(state.codebook)[None], axis=-1
    )
    assert (dists.min(1) < 1e-9).all()


def test_codebook_cosine_and_topk(rng, key):
    for metric, p in [("cosine", 2.0), ("euclidean", 1.0)]:
        model = CodebookModel((), 8, n_components=4, metric=metric, p=p,
                              topk=2, dtype=jnp.float64)
        state = model.init(key)
        x = jnp.asarray(rng.standard_normal((32, 8)))
        state = model.update(state, x, key)
        preds, assignment = model.predict(state, x, key)
        w = np.asarray(assignment.weights)
        assert ((w > 0).sum(-1) <= 2).all()  # topk masking active
