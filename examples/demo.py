"""Multi-level feature transport demo
(reference: ot_vae_lightning/demo.py — the Accelerate-based secondary entry,
rebuilt on the framework's own trainer primitives).

Trains a multi-level conv encoder/decoder with per-level MSE, then fits a
GaussianTransport per level between blurred-image features (source) and
clean-image features (target) and reports per-level restored PSNR.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from ot_vae_tpu.data import MNIST32, GaussianBlur
from ot_vae_tpu.networks.cnn import ConvBlock
from ot_vae_tpu.transport import GaussianTransport

LEVELS = 3


class MultiLevelEncDec(nn.Module):
    """Symmetric conv pyramid; encode/decode to any level
    (reference: demo.py MultiLevelEncDec)."""

    capacity: int = 8

    def setup(self):
        chans = [self.capacity * 2**i for i in range(LEVELS)]
        self.enc = [ConvBlock(c, down_sample=True, normalization="groupnorm")
                    for c in chans]
        self.dec = [ConvBlock(c, up_sample=True, normalization="groupnorm")
                    for c in ([1] + chans[:-1])[::-1][: LEVELS]]

    def encode(self, x, level: int):
        for i in range(level):
            x = self.enc[i](x)
        return x

    def decode(self, z, level: int):
        for i in range(LEVELS - level, LEVELS):
            z = self.dec[i](z)
        return z

    def __call__(self, x):
        # sum of per-level reconstruction targets (reference: demo.py:28-41)
        outs = []
        for level in range(1, LEVELS + 1):
            outs.append(self.decode(self.encode(x, level), level))
        return outs


def main(epochs: int = 3, batch_size: int = 100, n_train: int = 2000):
    dm = MNIST32(train_batch_size=batch_size, synthetic_train=n_train,
                 synthetic_test=500, seed=42)
    dm.setup()
    model = MultiLevelEncDec()
    x0 = jnp.zeros((batch_size, 32, 32, 1))
    variables = model.init(jax.random.PRNGKey(0), x0)
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])

    @jax.jit
    def step(params, opt_state, x):
        def loss_fn(p):
            outs = model.apply({"params": p}, x)
            return sum(jnp.mean((o - x) ** 2) for o in outs)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params = variables["params"]
    for epoch in range(epochs):
        for imgs, _ in dm.train_batches(epoch):
            params, opt_state, loss = step(params, opt_state, jnp.asarray(imgs))
        print(f"epoch {epoch}: loss={float(loss):.4f}")

    # per-level Gaussian transport: blurred features -> clean features
    blur = GaussianBlur(9, sigma=4.0)
    encode = jax.jit(
        lambda p, x, level: model.apply({"params": p}, x, level,
                                        method=MultiLevelEncDec.encode),
        static_argnums=2,
    )
    decode = jax.jit(
        lambda p, z, level: model.apply({"params": p}, z, level,
                                        method=MultiLevelEncDec.decode),
        static_argnums=2,
    )

    results = []
    for level in range(1, LEVELS + 1):
        feat_shape = None
        op = None
        state = None
        for imgs, _ in dm.val_batches():
            x = jnp.asarray(imgs)
            clean = encode(params, x, level)
            blurred = encode(params, blur(x), level)
            flat_c = clean.reshape(clean.shape[0], -1)
            flat_b = blurred.reshape(blurred.shape[0], -1)
            if op is None:
                op = GaussianTransport((), flat_c.shape[-1], diag=True)
                state = op.init()
            state = op.update(state, source_samples=flat_b, target_samples=flat_c)
            feat_shape = clean.shape[1:]
        state, cost = op.compute(state)

        # restore test images through the transported features
        sse, n = 0.0, 0
        for imgs, _ in dm.test_batches():
            x = jnp.asarray(imgs)
            z = encode(params, blur(x), level)
            moved = op.transport(state, z.reshape(z.shape[0], -1))
            restored = decode(params, moved.reshape(z.shape[0], *feat_shape), level)
            sse += float(jnp.sum((restored - x) ** 2))
            n += x.size
        rng_span = 3.25  # normalized MNIST range
        psnr = 10 * np.log10(rng_span**2 / (sse / n))
        print(f"level {level}: transport cost={float(jnp.mean(cost)):.3f}, "
              f"restored PSNR={psnr:.2f} dB")
        results.append({"level": level, "cost": float(jnp.mean(cost)),
                        "psnr": float(psnr)})
    return results


if __name__ == "__main__":
    main()
