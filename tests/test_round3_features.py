"""Round-3 regression tests: fixes flagged by the round-2 review.

Covers the min-mode top-k checkpoint admission bug (VERDICT r2 Weak #2 —
reference semantics: Lightning ModelCheckpoint, model/base.py:327-342).
"""
import numpy as np
import pytest

import ot_vae_tpu.trainer.checkpoint as ckpt_mod
from ot_vae_tpu.trainer.callbacks import ModelCheckpointCallback


class _FakeTrainer:
    monitor = "metric"
    state = None
    current_epoch = 0
    logged_metrics: dict = {}


class _FakeModel:
    mode = "min"


def _run_sequence(tmp_path, monkeypatch, mode, values, top_k=2):
    saves = []
    monkeypatch.setattr(
        ckpt_mod, "save_checkpoint",
        lambda path, state, model, metadata=None: saves.append(str(path)),
    )
    cb = ModelCheckpointCallback(
        dirpath=str(tmp_path), monitor="metric", mode=mode, save_top_k=top_k
    )
    trainer, model = _FakeTrainer(), _FakeModel()
    model.mode = mode
    for epoch, v in enumerate(values):
        trainer.current_epoch = epoch
        trainer.logged_metrics = {"metric": float(v)}
        cb.on_validation_epoch_end(trainer, model)
    return cb, saves


def test_topk_min_mode_admits_better(tmp_path, monkeypatch):
    """mode='min' (e.g. FID): once top-k is full, a strictly LOWER value must
    displace the worst saved one. Round 2 double-applied the sign, so this
    admission never happened (reproduced in VERDICT r2 Weak #2)."""
    cb, saves = _run_sequence(tmp_path, monkeypatch, "min", [30.0, 40.0, 10.0, 35.0])
    kept = sorted(v for v, _ in cb.saved)
    assert kept == [10.0, 30.0]  # 10 displaced 40; 35 (worse than both) rejected
    assert len(saves) == 3  # 30, 40, 10 were saved; 35 never was
    assert "10.000" in cb.best_path


def test_topk_min_mode_rejects_worse(tmp_path, monkeypatch):
    cb, saves = _run_sequence(tmp_path, monkeypatch, "min", [5.0, 6.0, 7.0, 8.0])
    assert sorted(v for v, _ in cb.saved) == [5.0, 6.0]
    assert len(saves) == 2


def test_topk_max_mode_still_correct(tmp_path, monkeypatch):
    cb, saves = _run_sequence(tmp_path, monkeypatch, "max", [15.0, 20.0, 25.0, 18.0])
    assert sorted(v for v, _ in cb.saved) == [20.0, 25.0]
    assert "25.000" in cb.best_path


def test_enable_compilation_cache_round_trip(tmp_path):
    """Opt-in persistent compilation cache: entries are written for compiles
    above the threshold, and a cleared in-process cache re-executes correctly
    through the persistent-cache read path (CPU backend — the axon tunnel's
    broken deserialize is documented on the helper, which is why this is
    opt-in rather than a Trainer default)."""
    import jax
    import jax.numpy as jnp

    from ot_vae_tpu.utils import enable_compilation_cache

    cache_dir = tmp_path / "xla_cache"
    enable_compilation_cache(str(cache_dir), min_compile_time_secs=0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T).sum()

        x = jnp.ones((64, 64), jnp.float32)
        first = float(f(x))
        entries = [p for p in cache_dir.rglob("*") if p.is_file()]
        assert entries, "no persistent-cache entries written"
        jax.clear_caches()  # force retrace → persistent-cache read path
        assert float(f(x)) == first
    finally:
        jax.config.update("jax_compilation_cache_dir", None)


def test_as_nhwc_scales_by_dtype_not_value_range():
    """uint8 scaling is decided from the source DTYPE: an all-dark uint8
    image (max value 1) must scale by 1/255 exactly like its bright
    siblings, and float sources must never be rescaled (round-2 advisor
    finding: a per-item max()>1.5 test split one dataset into two scales)."""
    from ot_vae_tpu.data.datasets import _as_nhwc

    dark = np.zeros((8, 8), np.uint8)
    dark[0, 0] = 1
    bright = np.full((8, 8), 255, np.uint8)
    assert np.isclose(_as_nhwc(dark).max(), 1.0 / 255.0)
    assert np.isclose(_as_nhwc(bright).max(), 1.0)
    # float sources are trusted as-is (torchvision transforms yield [0,1])
    f = np.full((8, 8, 1), 0.7, np.float32)
    np.testing.assert_array_equal(_as_nhwc(f), f)


def _load_bench_module():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "bench.py"
    spec = importlib.util.spec_from_file_location("_bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_tpu_retry_surfaces_error():
    """A persistent TPU-client fault (e.g. the rolling-upgrade libtpu
    version mismatch that killed MULTICHIP_r01/r02, or a hung-tunnel
    subprocess timeout) must not crash bench.py: _tpu_eval_with_retry
    retries, then returns NaNs + the error so main() can emit an honest
    stale-marked JSON line instead of exiting non-zero."""
    bench = _load_bench_module()
    calls = []

    def boom():
        calls.append(1)
        raise RuntimeError("FAILED_PRECONDITION: libtpu version mismatch")

    bf16, f32, err = bench._tpu_eval_with_retry(retries=2, wait_s=0,
                                                run_once=boom)
    assert err is not None and "libtpu" in str(err)
    assert bf16 != bf16 and f32 != f32  # NaN
    assert len(calls) == 2  # retried exactly `retries` times


def test_bench_tpu_retry_recovers_on_transient():
    """One transient fault followed by a healthy client must succeed."""
    bench = _load_bench_module()
    state = {"n": 0}

    def flaky():
        state["n"] += 1
        if state["n"] == 1:
            raise RuntimeError("transient")
        return 123.0, 45.0

    bf16, f32, err = bench._tpu_eval_with_retry(retries=2, wait_s=0,
                                                run_once=flaky)
    assert err is None and bf16 == 123.0 and f32 == 45.0


def test_bench_measure_subprocess_times_out_hung_child(monkeypatch, tmp_path):
    """The hang bound is a kill-on-timeout SUBPROCESS: an in-process
    SIGALRM watchdog never fires while blocked inside the tunnel's C++
    RPC (CPython delivers signals between bytecodes only). Simulate a
    wedged child with a sleeping stand-in and assert the parent raises
    within the bound instead of hanging."""
    import subprocess

    bench = _load_bench_module()

    real_run = subprocess.run

    def fake_run(cmd, **kw):
        assert "--measure-eval" in cmd
        return real_run(
            [cmd[0], "-c", "import time; time.sleep(60)"],
            **{k: v for k, v in kw.items()},
        )

    monkeypatch.setattr(subprocess, "run", fake_run)
    with pytest.raises(subprocess.TimeoutExpired):
        bench._measure_eval_subprocess(hang_timeout_s=2)


def test_bench_last_committed_eval_parses_detail(monkeypatch):
    """The stale fallback reads the committed BENCH_DETAIL.json shape."""
    import pathlib

    monkeypatch.chdir(pathlib.Path(__file__).resolve().parents[1])
    bench = _load_bench_module()
    bf16, f32 = bench._last_committed_eval()
    # BENCH_DETAIL.json is committed at the repo root; both precisions parse
    assert bf16 > 0 and f32 > 0
