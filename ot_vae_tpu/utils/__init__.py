"""Foundation utilities (reference: ot_vae_lightning/utils/__init__.py).

Pure-jnp re-implementations of the dim-algebra helpers the transport/codebook
subsystems rely on, plus EMA and smoothing helpers. The reference's
``FilterKwargs`` runtime-signature machinery (utils/__init__.py:78-109) is
deliberately absent: dynamic kwargs routing is incompatible with tracing, so
conditioning capability is declared statically at module construction
(see ot_vae_tpu/networks).
"""
from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "enable_compilation_cache",
    "ema",
    "laplace_smoothing",
    "permute_and_flatten",
    "unflatten_and_unpermute",
    "replicate_batch",
    "mean_replicated_batch",
    "std_replicated_batch",
    "unsqueeze_like",
    "camel2snake",
]


def enable_compilation_cache(
    cache_dir: str, min_compile_time_secs: float = 1.0
) -> None:
    """Opt in to JAX's persistent compilation cache.

    Production cold-starts of this framework are compile-dominated (the e2e
    transport example spends ~12 min of its ~30 min wall in XLA compiles);
    on a standard TPU runtime the persistent cache turns process restarts of
    identical programs into cache reads. Call before the first ``jit``
    execution::

        from ot_vae_tpu.utils import enable_compilation_cache
        enable_compilation_cache("~/.cache/ot_vae_tpu/xla")

    Deliberately OPT-IN, not default: on this environment's remote-TPU
    ("axon" tunnel) backend, cache *writes* work but reading a serialized
    executable back hangs (measured 2026-08-19: plain recompile of a trivial
    program 84–166 s; the cached-read run of the same program exceeded a
    420 s timeout twice while ``jax.devices()`` stayed healthy). Local
    TPU/CPU runtimes deserialize fine — tests pin the CPU round trip.
    """
    import os

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser(cache_dir)
    )
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_time_secs)
    )


def ema(moving_avg, new, decay: Optional[float]):
    """EMA merge; plain accumulation when ``decay`` is None
    (reference: ot_vae_lightning/utils/__init__.py:204-206)."""
    if decay is None:
        return moving_avg + new
    return moving_avg * decay + new * (1.0 - decay)


def laplace_smoothing(x, n_categories: int, eps: Optional[float] = 1e-5):
    """Additive smoothing that preserves the total mass
    (reference: ot_vae_lightning/utils/__init__.py:209-218)."""
    if eps is None:
        return x
    total = jnp.sum(x, axis=-1, keepdims=True)
    return (x + eps) / (total + n_categories * eps) * total


def _split_dims(ndim: int, permute_dims: Sequence[int]) -> Tuple[list, list]:
    all_dims = set(range(1, ndim))
    if not permute_dims:
        raise ValueError("`permute_dims` must contain at least one dimension")
    if not set(permute_dims).issubset(all_dims):
        raise ValueError("`permute_dims` must be a subset of the input dims")
    remaining = sorted(all_dims.difference(permute_dims))
    return remaining, list(permute_dims)


def permute_and_flatten(
    x: jax.Array,
    permute_dims: Sequence[int],
    batch_first: bool = True,
    flatten_batch: bool = False,
) -> jax.Array:
    """Move ``permute_dims`` to the end, flatten them into one event dim, and
    flatten the remaining dims into a leading "operator batch" dim
    (reference: ot_vae_lightning/utils/__init__.py:233-267).

    x: [B, d1, ..., dn] →
      batch_first=True:  [B, prod(remaining), prod(permute)]
      batch_first=False: [prod(remaining), B, prod(permute)]
      flatten_batch=True: [B * prod(remaining), prod(permute)]
    """
    remaining, permute_dims = _split_dims(x.ndim, permute_dims)
    if not remaining:
        return x.reshape(-1, int(np.prod([x.shape[d] for d in permute_dims]))) \
            if flatten_batch else x.reshape(x.shape[0], -1)

    if batch_first:
        xr = jnp.transpose(x, (0, *remaining, *permute_dims))
        lead = (x.shape[0], int(np.prod([x.shape[d] for d in remaining])))
    else:
        xr = jnp.transpose(x, (*remaining, 0, *permute_dims))
        lead = (int(np.prod([x.shape[d] for d in remaining])), x.shape[0])
    event = int(np.prod([x.shape[d] for d in permute_dims]))
    xr = xr.reshape(*lead, event)
    if flatten_batch:
        xr = xr.reshape(lead[0] * lead[1], event)
    return xr


def unflatten_and_unpermute(
    xr: jax.Array,
    orig_shape: Sequence[int],
    permute_dims: Sequence[int],
    batch_first: bool = True,
    flatten_batch: bool = False,
) -> jax.Array:
    """Inverse of :func:`permute_and_flatten`
    (reference: ot_vae_lightning/utils/__init__.py:270-311).

    ``orig_shape`` may use -1 for the batch dim: [-1, d1, ..., dn].
    """
    orig_shape = list(orig_shape)
    ndim = len(orig_shape)
    remaining, permute_dims = _split_dims(ndim, permute_dims)
    permute_shape = [orig_shape[d] for d in permute_dims]
    remaining_shape = [orig_shape[d] for d in remaining]

    if not remaining:
        return xr.reshape(*orig_shape)

    x = xr
    if flatten_batch:
        n_rem = int(np.prod(remaining_shape))
        x = x.reshape(*((-1, n_rem) if batch_first else (n_rem, -1)), x.shape[-1])

    if batch_first:
        x = x.reshape(-1, *remaining_shape, *permute_shape)  # [B, rem..., perm...]
    else:
        x = x.reshape(*remaining_shape, -1, *permute_shape)  # [rem..., B, perm...]

    # Build inverse permutation back to [B, d1, ..., dn].
    perm = [0] * ndim
    if batch_first:
        perm[0] = 0
        for i, d in enumerate(remaining):
            perm[d] = 1 + i
        for i, d in enumerate(permute_dims):
            perm[d] = 1 + len(remaining) + i
    else:
        perm[0] = len(remaining)
        for i, d in enumerate(remaining):
            perm[d] = i
        for i, d in enumerate(permute_dims):
            perm[d] = len(remaining) + 1 + i
    return jnp.transpose(x, perm)


def replicate_batch(batch, n: int):
    """Tile the batch n× along the leading dim (for multi-sample ELBO)
    (reference: ot_vae_lightning/utils/__init__.py:144-163)."""
    if n in (0, 1) or batch is None:
        return batch

    def rep(t):
        return jnp.tile(t, (n,) + (1,) * (t.ndim - 1))

    return jax.tree_util.tree_map(rep, batch)


def mean_replicated_batch(expanded, n: int):
    if n in (0, 1):
        return expanded
    return expanded.reshape(n, expanded.shape[0] // n, *expanded.shape[1:]).mean(0)


def std_replicated_batch(expanded, n: int):
    if n in (0, 1):
        return expanded
    return expanded.reshape(n, expanded.shape[0] // n, *expanded.shape[1:]).std(0)


def unsqueeze_like(tensor: jax.Array, like: jax.Array) -> jax.Array:
    """Append singleton dims to ``tensor`` until it matches ``like``'s rank
    (reference: ot_vae_lightning/utils/__init__.py:314-328)."""
    n = like.ndim - tensor.ndim
    if n < 0:
        raise ValueError(f"tensor.ndim={tensor.ndim} > like.ndim={like.ndim}")
    return tensor[(...,) + (None,) * n] if n else tensor


def camel2snake(name: str) -> str:
    return name[0].lower() + re.sub(r"(?!^)[A-Z]", lambda m: "_" + m.group(0).lower(), name[1:])
