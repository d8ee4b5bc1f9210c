"""LatentTransport callback unit tests: flatten/unflatten round trips,
class-conditional masked updates, stored-sample fit path
(parity: ot/transport_callback.py wiring beyond the e2e tests)."""
import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.data import GaussianBlur
from ot_vae_tpu.transport import (
    ConditionalLatentTransport,
    GaussianTransport,
    LatentTransport,
)


def _cb(**kw):
    defaults = dict(
        size=(4, 4, 8), transport_dims=(3,), transport_operator=GaussianTransport,
        transformations=GaussianBlur(3, sigma=1.0), common_operator=True,
        operator_kwargs=dict(diag=True), num_samples_to_log=0,
    )
    defaults.update(kw)
    return LatentTransport(**defaults)


def test_transport_dims_shapes():
    cb = _cb()
    assert cb.dim == 8 and cb.batch_shape == (4, 4)
    x = jnp.ones((2, 4, 4, 8))
    flat = cb._flatten(x)
    assert flat.shape == (2 * 16, 8)  # common_operator flattens needles
    np.testing.assert_array_equal(np.asarray(cb._unflatten(flat)), np.asarray(x))

    cb2 = _cb(common_operator=False, transport_dims=(1, 2))
    assert cb2.dim == 16 and cb2.operator.leading_shape == (8,)
    flat2 = cb2._flatten(x)
    assert flat2.shape == (8, 2, 16)  # [needles, batch, event]


def test_update_and_transport_roundtrip(rng, key):
    cb = _cb()
    cb.state = cb.operator.init(key)
    src = jnp.asarray(rng.standard_normal((16, 4, 4, 8)) + 2.0, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((16, 4, 4, 8)) - 2.0, jnp.float32)
    cb._update(src, {"kwargs": {}}, source=True)
    cb._update(tgt, {"kwargs": {}}, source=False)
    cb.state, cost = cb.operator.compute(cb.state, key=key)
    assert float(cost) > 1.0
    moved = cb.transport(src)
    assert moved.shape == src.shape
    # moved distribution sits near the target's mean
    assert abs(float(moved.mean()) - float(tgt.mean())) < 0.5


def test_class_conditional_masked_update(rng, key):
    """class_idx filters via zero sample weights — only class-0 samples shape
    the fitted Gaussian."""
    cb = _cb(class_idx=0)
    cb.state = cb.operator.init(key)
    labels = jnp.asarray([0] * 8 + [1] * 8)
    x = jnp.concatenate(
        [jnp.full((8, 4, 4, 8), 5.0), jnp.full((8, 4, 4, 8), -5.0)]
    ).astype(jnp.float32)
    cb._update(x, {"kwargs": {"labels": labels}}, source=False)
    # only 8·16 needles counted, and the target mean is the class-0 value
    from ot_vae_tpu.distributions import GaussianModel

    model = cb.operator.source_model
    params = model.fit(cb.state.target)
    assert abs(float(params.mean.mean()) - 5.0) < 1e-5
    assert float(cb.state.target.n) == 8 * 16


def test_store_samples_fit_path(rng, key):
    """store_source/store_target buffer raw needles and feed them to
    compute() (reference: ot/transport/base.py:134-149)."""
    cb = _cb(store_source=True, store_target=True,
             operator_kwargs=dict(diag=True, update_decay=0.5))
    cb.state = cb.operator.init(key)
    for i in range(3):
        x = jnp.asarray(rng.standard_normal((8, 4, 4, 8)), jnp.float32)
        cb._update(x + 1.0, {"kwargs": {}}, source=True)
        cb._update(x - 1.0, {"kwargs": {}}, source=False)
    assert len(cb._stored["source"]) == 3
    stored = jnp.concatenate(cb._stored["source"], axis=-2)
    cb.state, cost = cb.operator.compute(
        cb.state, stored, jnp.concatenate(cb._stored["target"], axis=-2), key=key
    )
    assert np.isfinite(float(cost))


def test_conditional_latent_transport_fanout(rng, key):
    class FakeTrainer:
        logged_metrics = {}
        global_step = 0
        current_epoch = 0
        first_val_batch = None

        class logger:
            @staticmethod
            def log_metrics(m, s):
                pass

        @staticmethod
        def print(*a):
            pass

    class FakeModel:
        test_metrics = None
        variables = None

    cond = ConditionalLatentTransport(
        num_classes=3,
        size=(4, 4, 8), transport_dims=(3,), transport_operator=GaussianTransport,
        transformations=GaussianBlur(3, sigma=1.0), common_operator=True,
        operator_kwargs=dict(diag=True),
    )
    assert len(cond.transports) == 3
    t = FakeTrainer()
    cond.on_fit_start(t, FakeModel())
    labels = jnp.asarray(list(range(3)) * 4 + [0, 1, 2, 0])
    x = jnp.asarray(rng.standard_normal((16, 4, 4, 8)), jnp.float32)
    for cb in cond.transports:
        cb._update(x, {"kwargs": {"labels": labels}}, source=True)
        cb._update(x + 1, {"kwargs": {"labels": labels}}, source=False)
    cond.on_validation_epoch_end(t, FakeModel())
    assert "transport/conditional/avg_transport_cost" in t.logged_metrics


def test_compensated_accumulation(rng):
    """Kahan-compensated f32 streaming matches f64 accumulation to ~1e-7
    where naive f32 drifts (SURVEY §7 float64-dependence hard part)."""
    from ot_vae_tpu.distributions import GaussianModel

    d = 8
    data = (rng.standard_normal((400, 64, d)) * 0.1 + 5.0).astype(np.float32)

    naive = GaussianModel((), d, diag=True, dtype=jnp.float32)
    comp = GaussianModel((), d, diag=True, dtype=jnp.float32, compensated=True)
    exact = GaussianModel((), d, diag=True, dtype=jnp.float64)

    sn, sc, se = naive.init(), comp.init(), exact.init()
    un = jax.jit(naive.update)
    uc = jax.jit(comp.update)
    for chunk in data:
        sn = un(sn, jnp.asarray(chunk))
        sc = uc(sc, jnp.asarray(chunk))
        se = exact.update(se, jnp.asarray(chunk, jnp.float64))

    pn, pc, pe = naive.fit(sn), comp.fit(sc), exact.fit(se)
    err_naive = float(jnp.abs(pn.cov - pe.cov.astype(jnp.float32)).max())
    err_comp = float(jnp.abs(pc.cov - pe.cov.astype(jnp.float32)).max())
    assert err_comp <= err_naive
    assert err_comp < 1e-4
