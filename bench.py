"""Benchmark: MNIST32 CNN VAE encode+decode throughput on TPU vs the
reference's torch-CPU equivalent (BASELINE.json north-star: >10×
Lightning-CPU img/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import numpy as np


def _jax_throughput(batch_size=250, outer=10, inner=20, warmup=2):
    """Encode+decode throughput with a device-resident inner loop — measures
    the chip, not host dispatch latency."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ot_vae_tpu.models import VAE
    from ot_vae_tpu.networks import CNN
    from ot_vae_tpu.priors import GaussianPrior

    encoder = CNN(1, 256, 32, 1, capacity=8, down_sample=True, residual="add")
    decoder = CNN(128, 1, 1, 32, capacity=8, up_sample=True, residual="add")
    model = VAE(metrics=None, encoder=encoder, decoder=decoder,
                prior=GaussianPrior(loss_coeff=0.1))
    batch = (jnp.zeros((batch_size, 32, 32, 1), jnp.float32),
             jnp.zeros((batch_size,), jnp.int32))
    variables = model.init_variables(jax.random.PRNGKey(0), batch)

    @jax.jit
    def fwd_n(variables, x, key):
        def body(i, acc):
            out = model.net.apply(variables, x, 0, jax.random.fold_in(key, i), False)
            return acc + jnp.mean(out)  # full-output dependency per step
        return lax.fori_loop(0, inner, body, jnp.zeros((), x.dtype))

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (batch_size, 32, 32, 1), jnp.float32)
    for _ in range(warmup):
        fwd_n(variables, x, key).block_until_ready()
    t0 = time.perf_counter()
    for i in range(outer):
        out = fwd_n(variables, x, jax.random.fold_in(key, i))
    out.block_until_ready()
    dt = time.perf_counter() - t0
    return batch_size * inner * outer / dt


def _torch_cpu_throughput(batch_size=250, iters=3, warmup=1):
    """The reference's compute path on CPU: equivalent torch CNN VAE
    (encode+decode with the same channel schedule, NCHW)."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(max(1, torch.get_num_threads()))

    def block(ic, oc, down=False, up=False):
        layers = []
        if up:
            layers.append(nn.Upsample(scale_factor=2))
        layers += [
            nn.BatchNorm2d(ic), nn.ReLU(),
            nn.Conv2d(ic, oc, 4 if down else 3, 2 if down else 1,
                      1 if down else 1),
            nn.BatchNorm2d(oc), nn.ReLU(), nn.Conv2d(oc, oc, 3, 1, 1),
        ]
        return nn.Sequential(*layers)

    enc_ch = [1, 8, 16, 32, 64, 256]
    dec_ch = [128, 64, 32, 16, 8, 1]
    encoder = nn.Sequential(*[block(i, o, down=True)
                              for i, o in zip(enc_ch[:-1], enc_ch[1:])])
    decoder = nn.Sequential(*[block(i, o, up=True)
                              for i, o in zip(dec_ch[:-1], dec_ch[1:])])
    encoder.eval(); decoder.eval()

    x = torch.randn(batch_size, 1, 32, 32)
    with torch.no_grad():
        for _ in range(warmup):
            z = encoder(x)
            decoder(z[:, :128, :, :])
        t0 = time.perf_counter()
        for _ in range(iters):
            z = encoder(x)
            decoder(z[:, :128, :, :])
        dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    tpu_ips = _jax_throughput()
    try:
        cpu_ips = _torch_cpu_throughput()
    except Exception:
        cpu_ips = float("nan")
    ratio = tpu_ips / cpu_ips if cpu_ips == cpu_ips else float("nan")
    print(json.dumps({
        "metric": "mnist32_vae_encode_decode_throughput",
        "value": round(tpu_ips, 1),
        "unit": "img/s/chip",
        "vs_baseline": round(ratio, 2) if ratio == ratio else None,
    }))


if __name__ == "__main__":
    main()
