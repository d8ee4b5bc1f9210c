"""Pallas Sinkhorn kernel vs the XLA reference implementation
(interpret mode on CPU; the compiled path is exercised on TPU by bench/verify,
measured max deviation ≤ 4e-8)."""
import jax
import jax.numpy as jnp
import numpy as np

from ot_vae_tpu.ops.sinkhorn_pallas import sinkhorn_log_auto, sinkhorn_log_pallas
from ot_vae_tpu.ops.w2 import sinkhorn_log


def test_pallas_kernel_matches_xla_interpret(rng):
    B, N, M = 2, 16, 24
    a = np.abs(rng.standard_normal((B, N))).astype(np.float32)
    a /= a.sum(-1, keepdims=True)
    b = np.abs(rng.standard_normal((B, M))).astype(np.float32)
    b /= b.sum(-1, keepdims=True)
    cost = np.abs(rng.standard_normal((B, N, M))).astype(np.float32)

    kw = dict(reg=1e-2, max_iter=300, threshold=1e-7)
    plan_pallas = np.asarray(
        sinkhorn_log_pallas(jnp.asarray(a), jnp.asarray(b), jnp.asarray(cost),
                            interpret=True, **kw)
    )
    plan_xla = np.asarray(
        sinkhorn_log(jnp.asarray(a), jnp.asarray(b), jnp.asarray(cost), **kw)
    )
    np.testing.assert_allclose(plan_pallas, plan_xla, atol=1e-6)
    np.testing.assert_allclose(plan_pallas.sum(-1), a, atol=1e-5)


def test_auto_dispatch_cpu_falls_back(rng):
    a = jnp.ones((8,), jnp.float32) / 8
    b = jnp.ones((8,), jnp.float32) / 8
    cost = jnp.asarray(np.abs(rng.standard_normal((8, 8))), jnp.float32)
    plan = sinkhorn_log_auto(a, b, cost, reg=1e-2, max_iter=200)
    np.testing.assert_allclose(np.asarray(plan).sum(-1), np.asarray(a), atol=1e-5)
