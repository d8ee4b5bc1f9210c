"""Trainer(accumulate_grad_batches=N) — Lightning-parity gradient
accumulation (reference: a Lightning Trainer flag the reference gets for
free; pl.Trainer(accumulate_grad_batches=...)). Semantics under test:

* mean of N micro-batch gradients, ONE optimizer step per window,
* all micro-batches of a window differentiate at the window-start params,
* mutable collections (batch_stats/prior_stats) update every micro-batch,
* global_step counts optimizer steps,
* a trailing partial window still steps (pre-divided by N — documented).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ot_vae_tpu.data import MNIST32
from ot_vae_tpu.metrics import PSNR, MetricCollection
from ot_vae_tpu.models import VAE
from ot_vae_tpu.networks import CNN
from ot_vae_tpu.priors import GaussianPrior
from ot_vae_tpu.trainer import Trainer


def _dm():
    return MNIST32(train_batch_size=32, val_batch_size=32, test_batch_size=32,
                   seed=0, synthetic_train=128, synthetic_test=64)


def _tiny():
    return VAE(
        metrics=MetricCollection({"psnr": PSNR()}),
        encoder=CNN(1, 8, 32, 8, capacity=4, down_sample=True),
        decoder=CNN(4, 1, 8, 32, capacity=4, up_sample=True),
        prior=GaussianPrior(),
    )


def test_accumulate_grad_mean_and_window_semantics():
    """Drives the production ``_grad_step``/``_apply_step`` directly:

    * accum over a 2-batch window == g0/2 + g1/2 (each measured by the SAME
      jitted function from a fresh zero accum — mean-of-grads semantics; a
      sum-of-grads bug doubles it, caught at 1e-6),
    * micro-batches do NOT move params (window-start-params semantics),
    * apply == adam(mean) at the window-start params (eager optax replay on
      the identical accum values — only jit-vs-eager ULPs remain).

    Why not a whole-fit params comparison: Adam's m̂/√v̂ step is exactly
    invariant to uniform gradient scaling, so final params cannot even
    distinguish mean from sum; and jit-vs-eager reassociation (~1e-5 on f32
    grads) flips near-zero elements' signs, which Adam amplifies to O(lr).
    """
    dm = _dm()
    model = _tiny()
    tr = Trainer(max_epochs=1, seed=0, accumulate_grad_batches=2,
                 lr_plateau=False)
    tr._init_fit(model, dm)
    batches = []
    for i, b in enumerate(dm.train_batches(0)):
        if i >= 2:
            break
        batches.append(jax.tree_util.tree_map(jnp.asarray, b))
    state0 = tr.state
    p0 = jax.tree_util.tree_map(np.asarray, state0.params)
    opt_state0 = jax.tree_util.tree_map(np.asarray, state0.opt_state)
    zeros = lambda: jax.tree_util.tree_map(  # noqa: E731
        jnp.zeros_like, state0.params)
    k0, k1 = tr._key(1, 0, 0), tr._key(1, 0, 1)

    # per-batch half-gradients from fresh zero accums (fresh states so
    # donated buffers are never reused)
    tr2 = Trainer(max_epochs=1, seed=0, accumulate_grad_batches=2,
                  lr_plateau=False)
    m2 = _tiny()
    tr2._init_fit(m2, dm)
    _, g0_half, _, _ = tr2._grad_step(tr2.state, zeros(), batches[0], k0)
    g0_half = jax.tree_util.tree_map(np.asarray, g0_half)
    tr3 = Trainer(max_epochs=1, seed=0, accumulate_grad_batches=2,
                  lr_plateau=False)
    m3 = _tiny()
    tr3._init_fit(m3, dm)
    _, g1_half, _, _ = tr3._grad_step(tr3.state, zeros(), batches[1], k1)
    g1_half = jax.tree_util.tree_map(np.asarray, g1_half)

    # the window under test
    s1, accum, _, _ = tr._grad_step(state0, zeros(), batches[0], k0)
    # micro-batches must not move params (window-start-params semantics)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    s2, accum, _, _ = tr._grad_step(s1, accum, batches[1], k1)
    accum_np = jax.tree_util.tree_map(np.asarray, accum)
    for a, h0, h1 in zip(jax.tree_util.tree_leaves(accum_np),
                         jax.tree_util.tree_leaves(g0_half),
                         jax.tree_util.tree_leaves(g1_half)):
        np.testing.assert_allclose(a, h0 + h1, atol=1e-6, rtol=1e-6)

    # apply == eager adam(mean) on identical inputs
    s3, fresh = tr._apply_step(s2, accum)
    assert all(float(jnp.max(jnp.abs(z))) == 0.0
               for z in jax.tree_util.tree_leaves(fresh))
    opt = model.optimizer()
    updates, _ = opt.update(
        jax.tree_util.tree_map(jnp.asarray, accum_np),
        jax.tree_util.tree_map(jnp.asarray, opt_state0),
        jax.tree_util.tree_map(jnp.asarray, p0))
    want = optax.apply_updates(
        jax.tree_util.tree_map(jnp.asarray, p0), updates)
    assert int(s3.step) == 1
    for a, b in zip(jax.tree_util.tree_leaves(s3.params),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_accumulate_fit_runs_and_counts_optimizer_steps():
    """Whole fit: 4 micro-batches at accumulate=2 -> global_step == 2 and a
    finite monitored metric."""
    dm = _dm()
    model = _tiny()
    tr = Trainer(max_epochs=1, seed=0, accumulate_grad_batches=2,
                 limit_batches=4, lr_plateau=False)
    tr.fit(model, dm)
    assert tr.global_step == 2
    assert int(tr.state.step) == 2
    assert np.isfinite(tr.logged_metrics["val/metrics/psnr"])


def test_accumulate_trailing_partial_window_steps():
    """3 micro-batches at accumulate=2 -> 2 optimizer steps (1 full window +
    the trailing partial), and training still learns (loss finite)."""
    dm = _dm()
    model = _tiny()
    tr = Trainer(max_epochs=1, seed=0, accumulate_grad_batches=2,
                 limit_batches=3, lr_plateau=False)
    tr.fit(model, dm)
    assert tr.global_step == 2
    assert np.isfinite(tr.logged_metrics["val/metrics/psnr"])


def test_gradient_clip_val_is_live_and_lr_reachable():
    """gradient_clip_val is LIVE in the optimizer chain and the LR-plateau
    machinery still finds/sets the injected learning rate through the chain
    (reference recipe: configs/ddp.yaml gradient_clip_val: 1.0).

    Detection trick: Adam's m̂/√v̂ is invariant to uniform gradient scaling
    while ε is negligible, so a fit comparison cannot see moderate clipping.
    Clipping to a norm far BELOW ε (1e-12) makes √v̂ ≪ ε and the update
    collapses toward 0 — unclipped it is ≈ lr. Unambiguous and exact."""
    from ot_vae_tpu.trainer.trainer import _find_lr, _set_lr

    def mk(clip):
        return VAE(
            encoder=CNN(1, 8, 32, 8, capacity=4, down_sample=True),
            decoder=CNN(4, 1, 8, 32, capacity=4, up_sample=True),
            prior=GaussianPrior(), gradient_clip_val=clip,
        )

    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.full((4,), 3.0, jnp.float32)}

    opt_plain = mk(None).optimizer()
    up_plain, _ = opt_plain.update(grads, opt_plain.init(params), params)
    assert float(jnp.max(jnp.abs(up_plain["w"]))) > 5e-4  # ≈ lr = 1e-3

    opt_clip = mk(1e-12).optimizer()
    st = opt_clip.init(params)
    up_clip, _ = opt_clip.update(grads, st, params)
    assert float(jnp.max(jnp.abs(up_clip["w"]))) < 1e-6, \
        "gradient_clip_val had no effect"

    # LR injection round-trips through the chained optimizer state
    lr = _find_lr(st)
    assert lr is not None and float(lr) > 0
    new = _set_lr(st, 1.23e-4)
    assert abs(float(_find_lr(new)) - 1.23e-4) < 1e-9  # f32 storage


def test_check_val_every_n_epoch():
    """Lightning Trainer(check_val_every_n_epoch=2): 3 epochs -> validation
    at epoch index 1 (2nd) and at the final epoch, i.e. exactly twice."""
    from ot_vae_tpu.trainer import Callback

    class Counter(Callback):
        count = 0

        def on_validation_epoch_end(self, trainer, model):
            Counter.count += 1

    Counter.count = 0
    dm = _dm()
    model = _tiny()
    tr = Trainer(max_epochs=3, seed=0, limit_batches=1, lr_plateau=False,
                 check_val_every_n_epoch=2, callbacks=[Counter()])
    tr.fit(model, dm)
    assert Counter.count == 2
