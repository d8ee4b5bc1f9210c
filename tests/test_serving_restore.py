"""Restoration serving: fitted LatentTransport state persistence + the
InferenceEngine.restore endpoint (the reference's test-time restoration,
ot/transport_callback.py:238-254, as a standalone serving path — the
reference cannot serve a fitted operator in a fresh process because its
operator buffers are never checkpointed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ot_vae_tpu.data.transforms import Identity
from ot_vae_tpu.metrics import PSNR, MetricCollection
from ot_vae_tpu.models import VAE
from ot_vae_tpu.networks import CNN
from ot_vae_tpu.priors import GaussianPrior
from ot_vae_tpu.serving import InferenceEngine
from ot_vae_tpu.transport import GaussianTransport, LatentTransport


def _tiny_vae():
    m = VAE(metrics=MetricCollection({"psnr": PSNR()}),
            encoder=CNN(1, 16, 16, 4, capacity=4, down_sample=True),
            decoder=CNN(8, 1, 4, 16, capacity=4, up_sample=True),
            prior=GaussianPrior(loss_coeff=0.1))
    batch = (jnp.zeros((8, 16, 16, 1), jnp.float32), jnp.zeros((8,), jnp.int32))
    m.variables = m.init_variables(jax.random.PRNGKey(0), batch)
    m.inference_preprocess = Identity()
    m.inference_postprocess = Identity()
    return m


def _fitted_cb(rng, key, **kw):
    defaults = dict(
        size=(4, 4, 8), transport_dims=(3,),
        transport_operator=GaussianTransport, transformations=Identity(),
        common_operator=True, operator_kwargs=dict(diag=True),
        num_samples_to_log=0,
    )
    defaults.update(kw)
    cb = LatentTransport(**defaults)
    cb.state = cb.operator.init(key)
    src = jnp.asarray(rng.standard_normal((32, 4, 4, 8)) + 2.0, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((32, 4, 4, 8)) - 1.0, jnp.float32)
    cb._update(src, {"kwargs": {}}, source=True)
    cb._update(tgt, {"kwargs": {}}, source=False)
    cb.state, _ = cb.operator.compute(cb.state, key=key)
    return cb


def test_save_load_state_round_trip(tmp_path, rng, key):
    cb = _fitted_cb(rng, key)
    path = str(tmp_path / "operator.npz")
    cb.save_state(path)

    cb2 = LatentTransport(
        size=(4, 4, 8), transport_dims=(3,),
        transport_operator=GaussianTransport, transformations=Identity(),
        common_operator=True, operator_kwargs=dict(diag=True),
        num_samples_to_log=0,
    )
    cb2.load_state(path)
    x = jnp.asarray(rng.standard_normal((8, 4, 4, 8)) + 2.0, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(cb.transport(x)), np.asarray(cb2.transport(x))
    )


def test_load_state_rejects_mismatched_operator(tmp_path, rng, key):
    cb = _fitted_cb(rng, key)
    path = str(tmp_path / "operator.npz")
    cb.save_state(path)

    other = LatentTransport(
        size=(4, 4, 16), transport_dims=(3,),  # dim 16 != saved dim 8
        transport_operator=GaussianTransport, transformations=Identity(),
        common_operator=True, operator_kwargs=dict(diag=True),
        num_samples_to_log=0,
    )
    with pytest.raises(ValueError):
        other.load_state(path)


def test_save_state_requires_fit():
    cb = LatentTransport(
        size=(4, 4, 8), transport_dims=(3,),
        transport_operator=GaussianTransport, transformations=Identity(),
        common_operator=True, operator_kwargs=dict(diag=True),
        num_samples_to_log=0,
    )
    with pytest.raises(ValueError):
        cb.save_state("/tmp/never-written.npz")


def test_engine_restore_matches_manual_path(rng, key):
    model = _tiny_vae()
    cb = _fitted_cb(rng, key)
    eng = InferenceEngine(model, batch_sizes=(4, 16))

    x = rng.random((4, 16, 16, 1)).astype(np.float32)  # exact bucket: no pad
    restored = eng.restore(x, cb)
    assert restored.shape == x.shape

    # manual encode → transport → decode with the same keys; the diag
    # non-stochastic operator is deterministic, so the two paths agree bitwise
    z = model.encode_fn(model.variables, jnp.asarray(x), jax.random.PRNGKey(0))
    manual = model.decode_fn(model.variables, cb.transport(z))
    np.testing.assert_array_equal(restored, np.asarray(manual))


def test_engine_restore_pads_and_slices(rng, key):
    model = _tiny_vae()
    cb = _fitted_cb(rng, key)
    eng = InferenceEngine(model, batch_sizes=(4, 16))
    x = rng.random((5, 16, 16, 1)).astype(np.float32)  # pads 5 -> 16
    restored = eng.restore(x, cb)
    assert restored.shape == x.shape


def test_conditional_save_load_fan_out(tmp_path, rng, key):
    from ot_vae_tpu.transport import ConditionalLatentTransport

    def _mk():
        return ConditionalLatentTransport(
            num_classes=2, size=(4, 4, 8), transport_dims=(3,),
            transport_operator=GaussianTransport, transformations=Identity(),
            common_operator=True, operator_kwargs=dict(diag=True),
        )

    cond = _mk()
    labels = jnp.asarray([0] * 8 + [1] * 8)
    x = jnp.asarray(rng.standard_normal((16, 4, 4, 8)), jnp.float32)
    for t in cond.transports:
        t.state = t.operator.init(key)
        t._update(x, {"kwargs": {"labels": labels}}, source=True)
        t._update(x + 1.0, {"kwargs": {"labels": labels}}, source=False)
        t.state, _ = t.operator.compute(t.state, key=key)
    path = str(tmp_path / "cond_op")
    cond.save_state(path)

    cond2 = _mk().load_state(path)
    probe = jnp.asarray(rng.standard_normal((4, 4, 4, 8)), jnp.float32)
    for t1, t2 in zip(cond.transports, cond2.transports):
        np.testing.assert_array_equal(
            np.asarray(t1.transport(probe)), np.asarray(t2.transport(probe))
        )


def test_engine_restore_requires_fitted_state(rng):
    model = _tiny_vae()
    cb = LatentTransport(
        size=(4, 4, 8), transport_dims=(3,),
        transport_operator=GaussianTransport, transformations=Identity(),
        common_operator=True, operator_kwargs=dict(diag=True),
        num_samples_to_log=0,
    )
    eng = InferenceEngine(model, batch_sizes=(4,))
    with pytest.raises(ValueError):
        eng.restore(rng.random((4, 16, 16, 1)).astype(np.float32), cb)
