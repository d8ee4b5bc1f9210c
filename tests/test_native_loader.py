"""Native C++ batcher (ot_vae_tpu/data/native/batcher.cpp): correctness vs
the NumPy path, deterministic shuffling, and the opt-in routing through
ArrayDataset (replaces the reference's DataLoader worker pool,
reference: ot_vae_lightning/data/base.py:88-99)."""
import numpy as np
import pytest

from ot_vae_tpu.data import ArrayDataset
from ot_vae_tpu.data.transforms import Identity, Normalize
from ot_vae_tpu.data import native_loader


pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="no g++ toolchain"
)


def _data(n=40, h=8, w=8, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.random((n, h, w, c)).astype(np.float32),
            rng.integers(0, 10, n).astype(np.int32))


def test_unshuffled_matches_numpy_path():
    imgs, labs = _data()
    nb = native_loader.NativeBatcher(imgs, labs, batch_size=8, seed=1)
    got = list(nb.epoch(0, shuffle=False))
    assert len(got) == 5
    for i, (bi, bl) in enumerate(got):
        np.testing.assert_array_equal(bi, imgs[i * 8 : (i + 1) * 8])
        np.testing.assert_array_equal(bl, labs[i * 8 : (i + 1) * 8])


def test_fused_normalize_bit_identical_to_transform():
    """The C++ normalize performs the same two IEEE float32 ops as the NumPy
    Normalize ((x - mean) / std) — BIT-identical, which is what licenses the
    native loader as the default for unshuffled val/test iteration."""
    imgs, labs = _data()
    mean, std = (0.5, 0.4, 0.6), (0.2, 0.3, 0.25)
    nb = native_loader.NativeBatcher(imgs, labs, 8, seed=1, mean=mean, std=std)
    bi, _ = next(nb.epoch(0, shuffle=False))
    expect = np.asarray(Normalize(mean, std)(imgs[:8]), np.float32)
    np.testing.assert_array_equal(bi, expect)


def test_fused_normalize_pad_bit_identical_mnist32_chain():
    """Compose([Normalize, Pad(2)]) — the MNIST32 eval transform — fuses into
    the native gather (normalized interior + exact-zero border) and the
    ArrayDataset default (unshuffled) routing picks it up bit-identically."""
    from ot_vae_tpu.data.transforms import Compose, Pad

    rng = np.random.default_rng(5)
    imgs = rng.random((24, 28, 28, 1)).astype(np.float32)
    labs = rng.integers(0, 10, 24).astype(np.int32)
    tf = Compose([Normalize((0.1307,), (0.3081,)), Pad(2)])
    ds = ArrayDataset(imgs, labs, tf)
    got = list(ds.batches(8, shuffle=False, seed=0))
    assert getattr(ds, "_native_cache", None), "chain should route native"
    assert got[0][0].shape == (8, 32, 32, 1)
    for i, (bi, bl) in enumerate(got):
        expect = np.asarray(tf(imgs[i * 8 : (i + 1) * 8]), np.float32)
        np.testing.assert_array_equal(bi, expect)
        np.testing.assert_array_equal(bl, labs[i * 8 : (i + 1) * 8])


def test_shuffle_is_deterministic_permutation():
    imgs, labs = _data(n=64, c=1)
    nb = native_loader.NativeBatcher(imgs, labs, 8, seed=7)
    ep0a = np.concatenate([b for b, _ in nb.epoch(0)])
    ep0b = np.concatenate([b for b, _ in nb.epoch(0)])
    ep1 = np.concatenate([b for b, _ in nb.epoch(1)])
    np.testing.assert_array_equal(ep0a, ep0b)          # (seed, epoch) stable
    assert not np.array_equal(ep0a, ep1)               # epochs differ
    # every epoch is a permutation of the dataset
    key = lambda a: sorted(map(tuple, a.reshape(len(a), -1)[:, :4]))  # noqa: E731
    assert key(ep0a) == key(imgs) and key(ep1) == key(imgs)


def test_abandoned_epoch_restart_is_clean():
    """A consumer may abandon an epoch mid-stream (the trainer breaking out
    of a val loop on limit_batches) and immediately start the next one while
    the worker thread is still filling. start_epoch must quiesce the worker
    (and the worker discard stale fills), or the new epoch's first batch is
    the ABANDONED epoch's prefetch (round-2 advisor medium finding —
    reproducible data race before the generation-counter fix). Repeated to
    widen the race window."""
    imgs, labs = _data(n=64, c=2, seed=9)
    nb = native_loader.NativeBatcher(imgs, labs, batch_size=8, seed=3)
    for trial in range(20):
        it = nb.epoch(trial, shuffle=True)   # shuffled: epoch-specific perm
        next(it)                             # consume ONE batch, abandon
        del it
        # restart immediately, unshuffled: stream must be the identity order
        for i, (bi, bl) in enumerate(nb.epoch(trial + 1, shuffle=False)):
            np.testing.assert_array_equal(bi, imgs[i * 8 : (i + 1) * 8])
            np.testing.assert_array_equal(bl, labs[i * 8 : (i + 1) * 8])


def test_arraydataset_default_routing(monkeypatch):
    """Unshuffled iteration routes through the native batcher by default and
    is bit-identical (incl. fused Normalize) to the forced-NumPy path;
    OT_VAE_NATIVE_LOADER=0 disables it entirely."""
    imgs, labs = _data(n=32, c=3)
    mean, std = (0.5, 0.4, 0.6), (0.2, 0.3, 0.25)
    ds = ArrayDataset(imgs, labs, Normalize(mean, std))
    monkeypatch.delenv("OT_VAE_NATIVE_LOADER", raising=False)
    default = list(ds.batches(8, shuffle=False, seed=3))
    assert getattr(ds, "_native_cache", None), "default should use native"
    monkeypatch.setenv("OT_VAE_NATIVE_LOADER", "0")
    python = list(ds.batches(8, shuffle=False, seed=3))
    assert len(default) == len(python) == 4
    for (na, nl), (pa, pl) in zip(default, python):
        np.testing.assert_array_equal(na, pa)
        np.testing.assert_array_equal(nl, pl)


def test_arraydataset_shuffled_stays_numpy_unless_opted_in(monkeypatch):
    """Shuffled (train) iteration keeps the NumPy permutation stream unless
    OT_VAE_NATIVE_LOADER=1 — the native Fisher–Yates stream differs and would
    shift seeded e2e floors."""
    imgs, labs = _data(n=32, c=1)
    ds = ArrayDataset(imgs, labs, Identity())
    monkeypatch.delenv("OT_VAE_NATIVE_LOADER", raising=False)
    got = np.concatenate([b for b, _ in ds.batches(8, True, seed=3, epoch=1)])
    rng = np.random.default_rng(3 + 1)
    idx = np.arange(32)
    rng.shuffle(idx)
    np.testing.assert_array_equal(got, imgs[idx])


def test_arraydataset_native_shuffled_covers_dataset(monkeypatch):
    imgs, labs = _data(n=32, c=1)
    ds = ArrayDataset(imgs, labs, Identity())
    monkeypatch.setenv("OT_VAE_NATIVE_LOADER", "1")
    batches = list(ds.batches(8, shuffle=True, seed=3, epoch=2))
    assert len(batches) == 4
    all_rows = np.concatenate([b for b, _ in batches])
    key = lambda a: sorted(map(tuple, a.reshape(len(a), -1)[:, :4]))  # noqa: E731
    assert key(all_rows) == key(imgs)
