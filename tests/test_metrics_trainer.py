"""Metric and trainer-infrastructure tests
(parity: metric lifecycle model/base.py:205-220, streaming FID
metrics/fid.py:90-126, checkpoints + EMA + callbacks)."""
import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.metrics import PSNR, FrechetInceptionDistance, MetricCollection
from ot_vae_tpu.data.transforms import (
    CenterCrop,
    Compose,
    GaussianBlur,
    Normalize,
    Pad,
    UnNormalize,
    from_spec,
    to_spec,
)


def test_psnr_matches_direct(rng):
    """Streaming PSNR equals the direct computation with inferred data range
    (torchmetrics semantics)."""
    target = rng.random((100, 8, 8, 1)).astype(np.float32)
    preds = target + rng.normal(0, 0.1, target.shape).astype(np.float32)
    m = PSNR()
    st = m.init()
    for i in range(0, 100, 25):
        st = m.update(st, preds=jnp.asarray(preds[i : i + 25]),
                      target=jnp.asarray(target[i : i + 25]))
    got = float(m.compute(st))
    rng_span = target.max() - target.min()
    expect = 10 * np.log10(rng_span**2 / np.mean((preds - target) ** 2))
    assert abs(got - expect) < 1e-3


def test_psnr_identical_is_large():
    x = jnp.ones((4, 8, 8, 1)) * 0.5
    x = x.at[0, 0, 0, 0].set(1.0)  # non-degenerate range
    m = PSNR()
    st = m.update(m.init(), preds=x, target=x)
    assert float(m.compute(st)) > 60


def test_fid_streaming(rng):
    """FID is ~0 for identical distributions, grows with a mean shift, and is
    +inf below min_obs (reference: metrics/fid.py:126)."""
    fid = FrechetInceptionDistance(feature_size=32, min_obs=100)
    a = rng.random((200, 8, 8, 3)).astype(np.float32)
    b = rng.random((200, 8, 8, 3)).astype(np.float32)

    st = fid.init()
    st = fid.update(st, samples=jnp.asarray(a), generated=jnp.asarray(b))
    same_dist = float(fid.compute(st))
    assert np.isfinite(same_dist) and same_dist < 0.5

    st2 = fid.init()
    st2 = fid.update(st2, samples=jnp.asarray(a),
                     generated=jnp.asarray(np.clip(b + 0.4, 0, 1)))
    shifted = float(fid.compute(st2))
    assert shifted > same_dist * 2 + 1e-3

    st3 = fid.init()
    st3 = fid.update(st3, samples=jnp.asarray(a[:50]), generated=jnp.asarray(b[:50]))
    assert np.isinf(float(fid.compute(st3)))


def test_fid_host_path_matches_pytorch_fid_formula(rng):
    """The concrete-state compute must equal the published pytorch-fid
    pipeline computed directly from the features: float64, unbiased np.cov,
    scipy.linalg.sqrtm(Σr·Σf) (pytorch_fid/fid_score.py)."""
    import scipy.linalg

    d = 24
    feats_r = rng.standard_normal((500, d)) * 1.3 + 0.2
    feats_f = rng.standard_normal((500, d)) * 0.9 - 0.1

    fid = FrechetInceptionDistance(
        feature_size=d, min_obs=100, feature_fn=lambda x: x
    )
    st = fid.update(fid.init(),
                    samples=jnp.asarray(feats_r, jnp.float32),
                    generated=jnp.asarray(feats_f, jnp.float32))
    ours = float(fid.compute(st))

    mu_r, mu_f = feats_r.mean(0), feats_f.mean(0)
    cov_r, cov_f = np.cov(feats_r, rowvar=False), np.cov(feats_f, rowvar=False)
    covmean = scipy.linalg.sqrtm(cov_r @ cov_f).real
    oracle = ((mu_r - mu_f) ** 2).sum() + np.trace(cov_r + cov_f - 2 * covmean)
    # f32 feature accumulation is the only divergence source
    np.testing.assert_allclose(ours, oracle, rtol=1e-4)

    # the traced (jittable, on-device f32) fallback stays consistent
    traced = float(jax.jit(fid.compute)(st))
    np.testing.assert_allclose(traced, oracle, rtol=0.05, atol=0.05)


def test_fid_kahan_compensated_accumulation(rng):
    """SURVEY §7 hard part: the FID Gram state is f32 + Kahan compensation.
    Large-mean features (Inception activations are non-negative with big
    means) cancel digits in Gram/n − μμᵀ; compensated streaming must stay
    near the float64 oracle where naive f32 accumulation drifts."""
    import scipy.linalg

    d, bs, n_batches, mean = 16, 64, 150, 30.0
    real = (rng.standard_normal((n_batches * bs, d)) + mean).astype(np.float32)
    fake = (rng.standard_normal((n_batches * bs, d)) * 1.3 + mean + 0.2
            ).astype(np.float32)

    fid = FrechetInceptionDistance(feature_size=d, min_obs=10,
                                   feature_fn=lambda x: x)
    st = fid.init()
    assert st.real_gram.dtype == jnp.float32  # production dtype, even under x64
    upd = jax.jit(lambda s, a, b: fid.update(s, samples=a, generated=b))
    for i in range(n_batches):
        sl = slice(i * bs, (i + 1) * bs)
        st = upd(st, jnp.asarray(real[sl]), jnp.asarray(fake[sl]))
    ours = float(fid.compute(st))

    # float64 oracle (pytorch-fid formula from the raw features)
    r64, f64 = real.astype(np.float64), fake.astype(np.float64)
    cov_r, cov_f = np.cov(r64, rowvar=False), np.cov(f64, rowvar=False)
    oracle = (((r64.mean(0) - f64.mean(0)) ** 2).sum()
              + np.trace(cov_r + cov_f
                         - 2 * scipy.linalg.sqrtm(cov_r @ cov_f).real))

    # naive f32 streaming (what the state would hold without compensation)
    g_r = np.zeros((d, d), np.float32)
    g_f = np.zeros((d, d), np.float32)
    s_r = np.zeros((d,), np.float32)
    s_f = np.zeros((d,), np.float32)
    for i in range(n_batches):
        sl = slice(i * bs, (i + 1) * bs)
        g_r += real[sl].T @ real[sl]
        g_f += fake[sl].T @ fake[sl]
        s_r += real[sl].sum(0)
        s_f += fake[sl].sum(0)
    n = float(n_batches * bs)
    mu_r, mu_f = s_r.astype(np.float64) / n, s_f.astype(np.float64) / n
    cr = (g_r.astype(np.float64) - n * np.outer(mu_r, mu_r)) / (n - 1)
    cf = (g_f.astype(np.float64) - n * np.outer(mu_f, mu_f)) / (n - 1)
    naive = (((mu_r - mu_f) ** 2).sum()
             + np.trace(cr + cf - 2 * scipy.linalg.sqrtm(cr @ cf).real))

    assert abs(ours - oracle) < 0.1 * abs(oracle), (ours, oracle)
    assert abs(ours - oracle) < abs(naive - oracle), (ours, naive, oracle)


def test_metric_collection_prefix():
    mc = MetricCollection({"psnr": PSNR()}, prefix="val/")
    states = mc.init()
    x = jnp.ones((2, 4, 4, 1)).at[0, 0, 0, 0].set(0.0)
    states = mc.update(states, preds=x, target=x)
    out = mc.compute(states)
    assert list(out) == ["val/psnr"]
    assert list(mc.clone("test/").compute(states)) == ["test/psnr"]


def test_transform_spec_roundtrip(rng):
    t = Compose([Normalize((0.1,), (0.3,)), Pad(2)])
    t2 = from_spec(to_spec(t))
    x = rng.random((2, 28, 28, 1)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(t(x)), np.asarray(t2(x)))
    inv = Compose([CenterCrop(28), UnNormalize((0.1,), (0.3,))])
    np.testing.assert_allclose(np.asarray(inv(np.asarray(t(x)))), x, atol=1e-6)


def test_gaussian_blur_matches_scipy(rng):
    from scipy.ndimage import gaussian_filter

    x = rng.random((1, 16, 16, 1)).astype(np.float32)
    blur = GaussianBlur(9, sigma=1.5)
    ours = np.asarray(blur(jnp.asarray(x)))[0, ..., 0]
    oracle = gaussian_filter(x[0, ..., 0], sigma=1.5, mode="constant", truncate=2.67)
    # interior pixels (away from boundary handling differences)
    np.testing.assert_allclose(ours[4:-4, 4:-4], oracle[4:-4, 4:-4], atol=5e-3)


def test_ema_params_track(rng):
    """EMA shadow params follow the trained params (reference: torch_ema,
    model/base.py:176-190)."""
    import optax

    from ot_vae_tpu.data import MNIST32
    from ot_vae_tpu.models import VAE
    from ot_vae_tpu.networks import CNN
    from ot_vae_tpu.priors import GaussianPrior
    from ot_vae_tpu.trainer import Trainer
    from ot_vae_tpu.metrics import MetricCollection as MC

    dm = MNIST32(train_batch_size=32, val_batch_size=32, test_batch_size=32,
                 seed=0, synthetic_train=64, synthetic_test=64)
    m = VAE(metrics=MC({"psnr": PSNR()}),
            encoder=CNN(1, 8, 32, 8, capacity=4, down_sample=True),
            decoder=CNN(4, 1, 8, 32, capacity=4, up_sample=True),
            prior=GaussianPrior(), ema_decay=0.5)
    tr = Trainer(max_epochs=2, seed=0, log_every_n_steps=100)
    tr.fit(m, dm)
    assert tr.state.ema_params is not None
    p = jax.tree_util.tree_leaves(tr.state.params)
    e = jax.tree_util.tree_leaves(tr.state.ema_params)
    diffs = [float(jnp.abs(a - b).max()) for a, b in zip(p, e)]
    assert max(diffs) > 0          # shadow differs from live params
    assert max(diffs) < 1.0        # but tracks them


def test_early_stopping():
    from ot_vae_tpu.trainer.callbacks import EarlyStopping

    class FakeTrainer:
        logged_metrics = {}
        monitor = "val/metrics/psnr"
        should_stop = False

    es = EarlyStopping(patience=2, min_delta=0.1)
    t = FakeTrainer()

    class M:
        mode = "max"

    for v in [10.0, 10.5, 10.51, 10.52, 10.53]:
        t.logged_metrics = {"val/metrics/psnr": v}
        es.on_validation_epoch_end(t, M())
    assert t.should_stop  # improvements below min_delta exhaust patience
