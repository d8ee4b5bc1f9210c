"""Fused log-domain Sinkhorn as a Pallas TPU kernel.

The XLA version (ot_vae_tpu/ops/w2.py:sinkhorn_log) issues one fused
logsumexp pair per `while_loop` iteration, re-reading the cost matrix from
HBM each time. This kernel keeps ``Cr = -C/reg`` resident in VMEM for the
whole fixed-point iteration — the inner loop is VMEM-bandwidth bound instead
of HBM-bound, which is the dominant win for the [N, M] ≤ ~1k problems the
transport operators solve (GMM couplings, codebook plans).

Semantics match ``sinkhorn_log``: same update order, stop when the
total-variation of the (u, v) update falls below ``threshold`` (all batch
elements — each batch element is an independent kernel instance, so
convergence is naturally per-element here, strictly tighter than the XLA
version's max-over-batch) or after ``max_iter``.

VMEM budget: Cr + plan + scratch ≈ 3·N·M·4 bytes → N·M ≤ ~1M elements.
``sinkhorn_log_auto`` dispatches to the XLA path above that, on non-TPU
backends, and under vmap-incompatible shapes.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl

from ot_vae_tpu.ops.w2 import sinkhorn_log as _sinkhorn_xla

__all__ = ["sinkhorn_log_pallas", "sinkhorn_log_auto"]

_STAB = 1e-8
_VMEM_ELEM_BUDGET = 1 << 20  # N*M elements of f32 kept resident


def _kernel(loga_ref, logb_ref, cr_ref, out_ref, *, max_iter: int, threshold: float):
    loga = loga_ref[:]  # [1, N]
    logb = logb_ref[:]  # [1, M]
    cr = cr_ref[:]  # [N, M]

    def logsumexp_rows(mat):  # over axis 0 → [1, M]
        m = jnp.max(mat, axis=0, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(mat - m), axis=0, keepdims=True))

    def logsumexp_cols(mat):  # over axis 1 → [N, 1]
        m = jnp.max(mat, axis=1, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(mat - m), axis=1, keepdims=True))

    def cond(carry):
        _, _, i, err = carry
        return jnp.logical_and(i < max_iter, err >= threshold)

    def body(carry):
        u, v, i, _ = carry  # u [1, N], v [1, M]
        # v' = logb - LSE_rows(Cr + uᵀ);  u' = loga - LSE_cols(Cr + v')ᵀ
        v_new = logb - logsumexp_rows(cr + u.T)
        u_new = loga - logsumexp_cols(cr + v_new).T
        err = jnp.sum(jnp.abs(u_new - u)) + jnp.sum(jnp.abs(v_new - v))
        return u_new, v_new, i + 1, err

    u0 = jnp.zeros_like(loga)
    v0 = jnp.zeros_like(logb)
    u, v, _, _ = lax.while_loop(
        cond, body, (u0, v0, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf, loga.dtype))
    )
    out_ref[:] = jnp.exp(u.T + v + cr)


def sinkhorn_log_pallas(
    a: jax.Array,
    b: jax.Array,
    C: jax.Array,
    reg: float = 1e-5,
    max_iter: int = 1000,
    threshold: float = _STAB,
    interpret: bool = False,
) -> jax.Array:
    """Entropic OT coupling, fused kernel. a [*, N], b [*, M], C [*, N, M]."""
    batch_shape = C.shape[:-2]
    N, M = C.shape[-2:]
    a2 = jnp.broadcast_to(a, (*batch_shape, N)).reshape(-1, 1, N)
    b2 = jnp.broadcast_to(b, (*batch_shape, M)).reshape(-1, 1, M)
    c2 = C.reshape(-1, N, M)

    log_a = jnp.log(a2 + _STAB)
    log_b = jnp.log(b2 + _STAB)
    cr = -c2 / reg

    call = pl.pallas_call(
        functools.partial(_kernel, max_iter=max_iter, threshold=float(threshold)),
        out_shape=jax.ShapeDtypeStruct((N, M), C.dtype),
        interpret=interpret,
    )
    plan = jax.vmap(call)(log_a, log_b, cr)
    return plan.reshape(*batch_shape, N, M)


def sinkhorn_log_auto(
    a: jax.Array,
    b: jax.Array,
    C: jax.Array,
    reg: float = 1e-5,
    max_iter: int = 1000,
    threshold: float = _STAB,
) -> jax.Array:
    """Dispatch: fused Pallas kernel on TPU for large, small-batch problems;
    the XLA ``lax.while_loop`` path for small or heavily batched plans, where
    its shared-iteration batch parallelism beats the kernel's sequential
    per-instance grid (measured batch32×128²: XLA 28.8 ms vs Pallas 33.0 ms).

    Measured reality (TPU v5e, 200 iters, median of 7): both paths are
    ~29 ms at 256², 512² AND 1024² — the fixed-point loop is bound by
    sequential-iteration latency, not HBM bandwidth, so VMEM residency buys
    only ~3-5% (256²: 27.9 vs 29.4 ms). The kernel is kept because it is
    never slower inside this window and its advantage grows once per-iteration
    work dominates iteration latency (plans ≥ ~2k² with few instances)."""
    N, M = C.shape[-2:]
    batch = int(np.prod(C.shape[:-2])) if C.ndim > 2 else 1
    on_tpu = jax.default_backend() == "tpu"
    if (
        on_tpu
        and C.dtype == jnp.float32
        and batch <= 4
        and 65536 <= N * M <= _VMEM_ELEM_BUDGET
    ):
        return sinkhorn_log_pallas(a, b, C, reg, max_iter, threshold)
    return _sinkhorn_xla(a, b, C, reg, max_iter, threshold)
