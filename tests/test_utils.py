"""Dim-algebra utility tests
(parity: doctests in /root/reference/ot_vae_lightning/utils/__init__.py:233-311)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ot_vae_tpu.utils import (
    ema,
    laplace_smoothing,
    mean_replicated_batch,
    permute_and_flatten,
    replicate_batch,
    std_replicated_batch,
    unflatten_and_unpermute,
    unsqueeze_like,
)


@pytest.mark.parametrize("batch_first", [True, False])
@pytest.mark.parametrize("flatten_batch", [False, True])
@pytest.mark.parametrize("permute_dims", [(1, 3), (1,), (2, 3), (1, 2, 3)])
def test_permute_flatten_roundtrip(rng, batch_first, flatten_batch, permute_dims):
    B, D1, B1, D2 = 5, 2, 3, 4
    x = jnp.asarray(rng.standard_normal((B, D1, B1, D2)))
    xr = permute_and_flatten(x, permute_dims, batch_first, flatten_batch)
    xo = unflatten_and_unpermute(xr, (-1, D1, B1, D2), permute_dims,
                                 batch_first, flatten_batch)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(xo))


def test_permute_flatten_shapes(rng):
    B, D1, B1, D2, B2, B3 = 10, 1, 2, 3, 4, 5
    x = jnp.asarray(rng.standard_normal((B, D1, B1, D2, B2, B3)))
    assert permute_and_flatten(x, (1, 3)).shape == (B, B1 * B2 * B3, D1 * D2)
    assert permute_and_flatten(x, (1, 3), batch_first=False).shape == (B1 * B2 * B3, B, D1 * D2)
    assert permute_and_flatten(x, (1, 3), flatten_batch=True).shape == (B * B1 * B2 * B3, D1 * D2)
    xr = permute_and_flatten(x, (1, 3))
    xo = unflatten_and_unpermute(xr, (-1, D1, B1, D2, B2, B3), (1, 3))
    np.testing.assert_array_equal(np.asarray(x), np.asarray(xo))


def test_replicate_and_reduce(rng):
    x = jnp.asarray(rng.standard_normal((4, 3)))
    r = replicate_batch(x, 3)
    assert r.shape == (12, 3)
    np.testing.assert_allclose(np.asarray(mean_replicated_batch(r, 3)), np.asarray(x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(std_replicated_batch(r, 3)), 0.0, atol=1e-12)


def test_ema_and_laplace():
    assert float(ema(jnp.asarray(1.0), jnp.asarray(2.0), None)) == 3.0
    assert abs(float(ema(jnp.asarray(1.0), jnp.asarray(2.0), 0.9)) - 1.1) < 1e-9
    x = jnp.asarray([1.0, 0.0, 3.0])
    sm = laplace_smoothing(x, 3, 1e-5)
    assert float(sm.sum()) == pytest.approx(4.0, rel=1e-6)
    assert float(sm[1]) > 0


def test_unsqueeze_like(rng):
    a = jnp.asarray(rng.standard_normal((3,)))
    b = jnp.asarray(rng.standard_normal((3, 4, 5)))
    assert unsqueeze_like(a, b).shape == (3, 1, 1)
