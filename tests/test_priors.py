"""Prior tests (parity: reference prior behaviors,
ot_vae_lightning/prior/{gaussian,conditional_gaussian,codebook}.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.priors import (
    CodebookPrior,
    ConditionalGaussianPrior,
    GaussianPrior,
    annealing_coeff,
)

F32 = jnp.float32


def test_annealing_coeff():
    assert float(annealing_coeff(0, 0)) == 1.0
    assert float(annealing_coeff(0, 100)) < 1e-6
    assert abs(float(annealing_coeff(50, 100)) - 0.5) < 1e-6
    assert float(annealing_coeff(100, 100)) == 1.0
    assert float(annealing_coeff(1000, 100)) == 1.0


def test_gaussian_prior_basic(rng, key):
    prior = GaussianPrior(loss_coeff=0.1)
    x = jnp.asarray(rng.standard_normal((4, 2, 2, 32)), F32)
    variables = prior.init(key, x, 0, key)
    z, loss, artifacts = prior.apply(variables, x, 0, key)
    assert z.shape == (4, 2, 2, 16)
    assert loss.shape == (4,)
    assert prior.out_size((2, 2, 32)) == (2, 2, 16)

    # zero-mean zero-logvar input -> KL == 0
    z0, loss0, _ = prior.apply(variables, jnp.zeros_like(x), 0, key)
    np.testing.assert_allclose(np.asarray(loss0), 0.0, atol=1e-6)

    s = prior.apply(variables, key, (4, 2, 2, 16), method=GaussianPrior.sample)
    assert s.shape == (4, 2, 2, 16)


def test_gaussian_prior_fixed_var_time(rng, key):
    prior = GaussianPrior(fixed_var=True)
    x = jnp.asarray(rng.standard_normal((4, 8)), F32)
    t = jnp.asarray([0.1, 0.5, 1.0, 0.0], F32)
    variables = prior.init(key, x, 0, key, time=t)
    z, loss, _ = prior.apply(variables, x, 0, key, time=t)
    assert z.shape == x.shape
    assert prior.out_size((8,)) == (8,)


def test_gaussian_prior_empirical_kl_close_to_closed_form(rng, key):
    closed = GaussianPrior()
    emp = GaussianPrior(empirical_kl=True)
    x = jnp.asarray(rng.standard_normal((512, 64)), F32) * 0.3
    v = closed.init(key, x, 0, key)
    _, l_closed, _ = closed.apply(v, x, 0, key)
    # average MC KL over many draws approaches the closed form
    ls = []
    for i in range(64):
        _, l_e, _ = emp.apply(v, x, 0, jax.random.fold_in(key, i))
        ls.append(np.asarray(l_e))
    np.testing.assert_allclose(
        np.mean(ls, axis=0).mean(), np.asarray(l_closed).mean(), rtol=0.1, atol=0.05
    )


def test_conditional_gaussian_sgd_mode(rng, key):
    prior = ConditionalGaussianPrior(dim=(2, 2, 8), num_classes=5)
    x = jnp.asarray(rng.standard_normal((4, 2, 2, 16)), F32)
    labels = jnp.asarray([0, 1, 2, 3])
    variables = prior.init(key, x, 0, key, labels=labels)
    assert "params" in variables  # SGD mode: tables are trainable
    z, loss, _ = prior.apply(variables, x, 0, key, labels=labels)
    assert z.shape == (4, 2, 2, 8)
    s = prior.apply(variables, key, (4,), labels=labels,
                    method=ConditionalGaussianPrior.sample)
    assert s.shape == (4, 2, 2, 8)


def test_conditional_gaussian_ema_mode(rng, key):
    """EMA mode pulls the per-class prior toward the class posterior means
    (reference: conditional_gaussian.py:106-120)."""
    prior = ConditionalGaussianPrior(dim=(4,), num_classes=2, ema_decay=0.5)
    labels = jnp.asarray([0, 0, 1, 1] * 8)
    # class 0 near +2, class 1 near -2 (mean half of x; logvar half ~ 0)
    mu = np.where(np.asarray(labels)[:, None] == 0, 2.0, -2.0) + 0.01 * np.asarray(
        jax.random.normal(key, (32, 4))
    )
    x = jnp.asarray(np.concatenate([mu, np.zeros_like(mu)], -1), F32)
    variables = prior.init(key, x, 0, key, labels=labels)
    assert "prior_stats" in variables

    stats = variables["prior_stats"]
    for _ in range(30):
        (_, _, _), mut = prior.apply(
            {"prior_stats": stats}, x, 0, key, labels=labels, train=True,
            mutable=["prior_stats"],
        )
        stats = mut["prior_stats"]
    mu_table = np.asarray(stats["mu"])
    assert abs(mu_table[0].mean() - 2.0) < 0.2
    assert abs(mu_table[1].mean() + 2.0) < 0.2


def test_codebook_prior_pixel_embedding(rng, key):
    """embed_dims=(3,) on NHWC: quantize each pixel's channel vector."""
    prior = CodebookPrior(
        latent_size=(4, 4, 8), embed_dims=(3,), loss="l2",
        n_components=16, training_mode="argmax",
    )
    assert prior.dimensionality == 8
    assert prior.n_tokens == 16
    x = jnp.asarray(rng.standard_normal((4, 4, 4, 8)), F32)
    variables = prior.init({"params": key}, x, 0, key)
    (z, loss, artifacts), mut = prior.apply(
        variables, x, 0, key, train=True, mutable=["prior_stats"]
    )
    assert z.shape == x.shape
    assert loss.shape == (4,)
    assert artifacts["indices"].shape == (4, 16)
    assert artifacts["distribution"].shape == (4, 16, 16)

    # straight-through: grads flow to x
    def f(x_):
        z_, l_, _ = prior.apply(variables, x_, 0, key, train=False)
        return jnp.sum(z_**2) + jnp.sum(l_)

    g = jax.grad(f)(x)
    assert float(jnp.abs(g).max()) > 0

    s = prior.apply(variables, key, (4, 4, 4, 8), method=CodebookPrior.sample)
    assert s.shape == (4, 4, 4, 8)


def test_codebook_prior_whole_tensor(rng, key):
    prior = CodebookPrior(
        latent_size=(2, 2, 4), embed_dims=(1, 2, 3), loss="kl",
        n_components=8, training_mode="gumbel-softmax", temperature=0.5,
    )
    assert prior.dimensionality == 16
    assert prior.n_tokens == 1
    x = jnp.asarray(rng.standard_normal((4, 2, 2, 4)), F32)
    variables = prior.init({"params": key}, x, 0, key)
    (z, loss, artifacts), _ = prior.apply(
        variables, x, 0, key, train=True, mutable=["prior_stats"]
    )
    assert z.shape == x.shape
    assert loss.shape == (4,)
