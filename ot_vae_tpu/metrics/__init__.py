"""Streaming metrics as pytree states
(reference: torchmetrics usage in ot_vae_lightning/model/base.py:90-93 and the
custom streaming FID, ot_vae_lightning/metrics/fid.py:29-130).

A metric is a config object with pure functions::

    init() -> state (pytree)
    update(state, **batch) -> state        # jit-safe, psum-free
    reduce(state, comm) -> state           # cross-device state reduction
    compute(state) -> scalar

``batch`` carries the keys the reference's MetricCollection update receives:
``preds``, ``target``, ``samples``, ``generated`` (model/base.py:205-213).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ot_vae_tpu.ops.matrix import make_psd, mean_cov, sqrtm, symmetrize
from ot_vae_tpu.parallel.comm import NO_COMM, Comm

__all__ = ["PSNR", "FrechetInceptionDistance", "MetricCollection", "Metric"]


class Metric:
    higher_is_better: bool = True

    def init(self):
        raise NotImplementedError

    def update(self, state, **batch):
        raise NotImplementedError

    def reduce(self, state, comm: Comm):
        return comm.psum(state)

    def compute(self, state):
        raise NotImplementedError

    def prepare(self, state, model=None, trainer=None):
        """One-time preparation before an eval loop — e.g. computing
        reference-set statistics once (reference ``prepare_metric`` hook,
        model/base.py:197-203). Default: no-op."""
        return state


class _PSNRState(struct.PyTreeNode):
    sse: jax.Array
    n: jax.Array
    data_min: jax.Array
    data_max: jax.Array


@dataclasses.dataclass(frozen=True)
class PSNR(Metric):
    """Peak signal-to-noise ratio with the torchmetrics default semantics:
    when ``data_range`` is None it is inferred from the observed target range
    (torchmetrics PeakSignalNoiseRatio, used by every reference CI floor)."""

    data_range: Optional[float] = None
    higher_is_better: bool = True

    def init(self):
        return _PSNRState(
            sse=jnp.zeros(()), n=jnp.zeros(()),
            data_min=jnp.asarray(jnp.inf), data_max=jnp.asarray(-jnp.inf),
        )

    def update(self, state, preds=None, target=None, **_):
        if preds is None or target is None:
            return state
        return _PSNRState(
            sse=state.sse + jnp.sum((preds.astype(jnp.float32) - target) ** 2),
            n=state.n + np.prod(target.shape),
            data_min=jnp.minimum(state.data_min, jnp.min(target)),
            data_max=jnp.maximum(state.data_max, jnp.max(target)),
        )

    def reduce(self, state, comm: Comm):
        return _PSNRState(
            sse=comm.psum(state.sse), n=comm.psum(state.n),
            data_min=comm.pmin(state.data_min),
            data_max=comm.pmax(state.data_max),
        )

    def compute(self, state):
        rng = (
            self.data_range
            if self.data_range is not None
            else state.data_max - state.data_min
        )
        mse = state.sse / jnp.maximum(state.n, 1.0)
        return 10.0 * jnp.log10(rng**2 / jnp.maximum(mse, 1e-12))


class _FIDState(struct.PyTreeNode):
    real_sum: jax.Array
    real_gram: jax.Array
    real_n: jax.Array
    fake_sum: jax.Array
    fake_gram: jax.Array
    fake_n: jax.Array
    # Kahan compensation buffers for the f32 streaming sums (SURVEY §7 hard
    # parts: "FID's Gram state — keep fp32 + compensation"). Inception
    # features have large means, so Gram/n − μμᵀ cancels ~2 decimal digits;
    # uncompensated f32 accumulation over 50k samples moves FID by tenths of
    # a point. Compensation is linear, so cross-process psum reduces each
    # buffer independently and compute() folds them in.
    real_sum_c: jax.Array
    real_gram_c: jax.Array
    fake_sum_c: jax.Array
    fake_gram_c: jax.Array


def _kahan_add(total, comp, add):
    """One compensated-summation step; carries the rounding error forward
    (same scheme as distributions/gaussian.py:_kahan_add)."""
    y = add - comp
    t = total + y
    comp_new = (t - total) - y
    return t, comp_new


def _default_features(feature_size: int) -> Callable:
    """Offline stand-in for InceptionV3 (no pretrained weights without network
    egress): fixed seeded random-projection features of multi-scale image
    statistics. Deterministic across runs; pass a real feature net via
    ``feature_fn`` for production FID."""

    def fn(images: jax.Array) -> jax.Array:
        b = images.shape[0]
        if images.shape[-1] == 1:
            images = jnp.tile(images, (1, 1, 1, 3))
        pooled = [images]
        x = images
        for _ in range(2):
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            pooled.append(x)
        feats = jnp.concatenate([p.reshape(b, -1) for p in pooled], axis=-1)
        key = jax.random.PRNGKey(1234)
        proj = jax.random.normal(key, (feats.shape[-1], feature_size)) / float(
            np.sqrt(feats.shape[-1])
        )
        return jnp.tanh(feats @ proj)

    return fn


_DISCOVERED_FEATURE_FNS: dict = {}


def _discovered_or_default(feature_size: int) -> Callable:
    """Default feature net for FID: a discovered local InceptionV3 weights
    npz when one exists (``discover_inception_weights`` — drop the file, get
    real-weight FID with zero code change), else the offline random-
    projection stand-in. Built feature fns are cached per (path, variant)."""
    from ot_vae_tpu.metrics.inception import (
        discover_inception_weights,
        make_inception_feature_fn,
    )

    found = discover_inception_weights()
    if found is None:
        return _default_features(feature_size)
    if found not in _DISCOVERED_FEATURE_FNS:
        fn = make_inception_feature_fn(found[0], variant=found[1])
        # feature width via eval_shape (a trace, zero FLOPs) — a discovered
        # npz only serves metrics whose feature_size matches it; a mismatch
        # (e.g. the narrow stand-ins tests build) falls back to the random-
        # projection features instead of a shape error deep in the update
        width = jax.eval_shape(
            fn, jax.ShapeDtypeStruct((1, 299, 299, 3), jnp.float32)
        ).shape[-1]
        _DISCOVERED_FEATURE_FNS[found] = (fn, int(width))
    fn, width = _DISCOVERED_FEATURE_FNS[found]
    if width != feature_size:
        import warnings

        warnings.warn(
            f"discovered inception weights {found[0]} produce {width}-wide "
            f"features but this metric was built with feature_size="
            f"{feature_size}; using the offline stand-in features instead "
            f"(build the metric with feature_size={width} to use the npz)"
        )
        return _default_features(feature_size)
    return fn


@dataclasses.dataclass(frozen=True)
class FrechetInceptionDistance(Metric):
    """Streaming FID: accumulates Σf and the Gram matrix Σffᵀ instead of
    buffering features (reference: metrics/fid.py:90-122); returns +inf below
    ``min_obs`` observations (reference: fid.py:126).

    With no explicit ``feature_fn``, a local InceptionV3 weights npz is
    auto-discovered (see :func:`~ot_vae_tpu.metrics.inception.
    discover_inception_weights`); ``feature_size`` must then match the
    weights' feature width (2048 for real exports)."""

    feature_size: int = 2048
    feature_fn: Optional[Callable] = None
    min_obs: int = 1000
    higher_is_better: bool = False

    def _features(self, images):
        fn = self.feature_fn or _discovered_or_default(self.feature_size)
        return fn(images)

    def init(self):
        d = self.feature_size
        # explicitly f32: the production dtype everywhere (x64 is test-only),
        # and the compensated-summation design target — under x64 a default
        # jnp.zeros would silently make the state f64 and diverge from what
        # ships on TPU
        def z(shape):
            return jnp.zeros(shape, jnp.float32)
        return _FIDState(z((d,)), z((d, d)), z(()), z((d,)), z((d, d)), z(()),
                         z((d,)), z((d, d)), z((d,)), z((d, d)))

    def update(self, state, samples=None, generated=None, **_):
        if samples is not None:  # real data distribution
            f = self._features(samples).astype(jnp.float32)
            s, sc = _kahan_add(state.real_sum, state.real_sum_c, f.sum(0))
            g, gc = _kahan_add(state.real_gram, state.real_gram_c, f.T @ f)
            state = state.replace(
                real_sum=s, real_sum_c=sc, real_gram=g, real_gram_c=gc,
                real_n=state.real_n + f.shape[0],
            )
        if generated is not None:  # model samples
            f = self._features(generated).astype(jnp.float32)
            s, sc = _kahan_add(state.fake_sum, state.fake_sum_c, f.sum(0))
            g, gc = _kahan_add(state.fake_gram, state.fake_gram_c, f.T @ f)
            state = state.replace(
                fake_sum=s, fake_sum_c=sc, fake_gram=g, fake_gram_c=gc,
                fake_n=state.fake_n + f.shape[0],
            )
        return state

    def compute(self, state):
        """FID from the streamed moments.

        Concrete states (the trainer calls compute from the host loop) take
        the float64 host path that reproduces the published pytorch-fid
        pipeline bit-for-bit in spirit: unbiased (n−1) covariances and
        ``scipy.linalg.sqrtm(Σr·Σf)`` in double precision with the eps-ridge
        retry (pytorch_fid/fid_score.py:calculate_frechet_distance — also
        what the reference's torchmetrics FID feeds its f64 path). This is
        simultaneously the accuracy-correct choice (a 2048² spectrum has
        hundreds of near-zero eigenvalues — f32 on-device sqrtm moves FID by
        whole points) and the fast one (the TPU's sequential eigh pipeline
        is the slowest op in the library). Traced states (a user jitting
        compute) keep the on-device f32 formulation.
        """
        if isinstance(state.real_sum, jax.core.Tracer):
            return self._compute_traced(state)

        n_r = float(state.real_n)
        n_f = float(state.fake_n)
        if n_r < self.min_obs or n_f < self.min_obs:
            return jnp.asarray(jnp.inf)
        # fold the Kahan compensation in at f64 (sum stored the rounded
        # total, comp the residual; the true sum is their difference)
        sum_r = (np.asarray(state.real_sum, np.float64)
                 - np.asarray(state.real_sum_c, np.float64))
        sum_f = (np.asarray(state.fake_sum, np.float64)
                 - np.asarray(state.fake_sum_c, np.float64))
        mu_r, mu_f = sum_r / n_r, sum_f / n_f
        # unbiased covariance from streaming sums: (Σffᵀ − n·μμᵀ)/(n−1)
        cov_r = ((np.asarray(state.real_gram, np.float64)
                  - np.asarray(state.real_gram_c, np.float64))
                 - n_r * np.outer(mu_r, mu_r)) / max(n_r - 1.0, 1.0)
        cov_f = ((np.asarray(state.fake_gram, np.float64)
                  - np.asarray(state.fake_gram_c, np.float64))
                 - n_f * np.outer(mu_f, mu_f)) / max(n_f - 1.0, 1.0)
        # tr sqrtm(Σr·Σf) via the symmetric equivalent Σ√eig(√Σr·Σf·√Σr):
        # identical to pytorch-fid's scipy.linalg.sqrtm trace in exact
        # arithmetic (pinned by test at 1e-4), but two LAPACK eighs instead
        # of a Schur decomposition — scipy's sqrtm measured 154 s at d=512
        # on this host where the eigh pair is sub-second. Eigenvalue clips
        # play the role of pytorch-fid's eps-ridge retry on singular input.
        cov_r = 0.5 * (cov_r + cov_r.T)
        w_r, v_r = np.linalg.eigh(cov_r)
        sqrt_r = (v_r * np.sqrt(np.clip(w_r, 0.0, None))) @ v_r.T
        inner = sqrt_r @ cov_f @ sqrt_r
        w_i = np.linalg.eigvalsh(0.5 * (inner + inner.T))
        tr_covmean = float(np.sqrt(np.clip(w_i, 0.0, None)).sum())
        fid = (
            float(np.sum((mu_r - mu_f) ** 2))
            + float(np.trace(cov_r) + np.trace(cov_f)) - 2.0 * tr_covmean
        )
        return jnp.asarray(fid)

    def _compute_traced(self, state):
        """On-device f32 fallback for jitted callers (biased n-divisor
        covariance; ±points-level deviation from the f64 host path on a
        2048² feature spectrum — prefer host compute for reporting)."""
        mean_r, cov_r = mean_cov(
            state.real_sum - state.real_sum_c,
            state.real_gram - state.real_gram_c,
            jnp.maximum(state.real_n, 1.0),
        )
        mean_f, cov_f = mean_cov(
            state.fake_sum - state.fake_sum_c,
            state.fake_gram - state.fake_gram_c,
            jnp.maximum(state.fake_n, 1.0),
        )
        cov_r = make_psd(symmetrize(cov_r))
        cov_f = make_psd(symmetrize(cov_f))
        mix = sqrtm(symmetrize(sqrtm(cov_r) @ cov_f @ sqrtm(cov_r)))
        fid = jnp.sum((mean_r - mean_f) ** 2) + jnp.trace(cov_r + cov_f - 2 * mix)
        enough = jnp.logical_and(
            state.real_n >= self.min_obs, state.fake_n >= self.min_obs
        )
        return jnp.where(enough, fid, jnp.inf)


@dataclasses.dataclass(frozen=True)
class MetricCollection:
    """Named metrics updated together with a shared prefix
    (reference: torchmetrics MetricCollection cloning, model/base.py:90-93)."""

    metrics: Dict[str, Metric]
    prefix: str = ""

    def clone(self, prefix: str) -> "MetricCollection":
        return MetricCollection(dict(self.metrics), prefix)

    def init(self):
        return {name: m.init() for name, m in self.metrics.items()}

    def update(self, states, **batch):
        return {
            name: self.metrics[name].update(states[name], **batch)
            for name in self.metrics
        }

    def reduce(self, states, comm: Comm = NO_COMM):
        return {
            name: self.metrics[name].reduce(states[name], comm)
            for name in self.metrics
        }

    def prepare(self, states, model=None, trainer=None):
        return {
            name: self.metrics[name].prepare(states[name], model, trainer)
            for name in self.metrics
        }

    def compute(self, states) -> Dict[str, jax.Array]:
        return {
            self.prefix + name: self.metrics[name].compute(states[name])
            for name in self.metrics
        }
