"""Benchmark: MNIST32 CNN VAE throughput on TPU vs the reference's torch-CPU
equivalent (BASELINE.json north-star: >10× Lightning-CPU img/s/chip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``python bench.py --detail`` additionally writes BENCH_DETAIL.json with:
train-step throughput (fwd+bwd+optimizer), XLA-counted FLOPs → achieved
TFLOP/s and MFU, bf16 vs f32 throughput, serving latency, and OT-core kernel
benches (sqrtm eigh vs Newton–Schulz, Sinkhorn XLA vs Pallas).

Methodology (hard-won, in order of discovery):
1. Device-resident ``lax.fori_loop`` inner loop — per-call host dispatch
   otherwise dominates.
2. Fresh RNG-derived input per iteration — a constant input lets XLA hoist
   the encoder out of the loop (round-1 defect).
3. **Sync by VALUE FETCH, never ``block_until_ready``** — on the remote-TPU
   (axon tunnel) backend, ``block_until_ready`` can return before the work
   executes when the service queue is busy, inflating throughput by 100×
   (round-1/2 defect: 3.27M "img/s" recorded where the true number is ~45k).
   Every timed call here ends in ``float(result)``, the only reliable
   barrier, with the inner loop sized so the ~30 ms fetch round-trip is <2%
   of the measurement.
4. Fresh key per timed call so no call repeats a previous call's inputs.
"""
import argparse
import json
import statistics
import time

import numpy as np


def _timed_calls(call, inner_images, repeats=3):
    """call(j) must END in a value fetch. Returns (img/s median, spread)."""
    call(-1)  # warm: compile + drain any queue backlog
    times = []
    for j in range(repeats):
        t0 = time.perf_counter()
        call(j)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    return inner_images / med, (inner_images / max(times),
                                inner_images / min(times))


def _flops_of(jitted, *args):
    """XLA-counted FLOPs of one call (best effort across jax versions)."""
    return _cost_of(jitted, *args)["flops"]


def _cost_of(jitted, *args):
    """XLA cost analysis of one call: flops + HBM bytes accessed (best
    effort; either may be NaN on backends that don't report it)."""
    try:
        comp = jitted.lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {"flops": float(ca.get("flops", float("nan"))),
                "bytes": float(ca.get("bytes accessed", float("nan")))}
    except Exception:
        return {"flops": float("nan"), "bytes": float("nan")}


def _build_model(dtype=None):
    import jax.numpy as jnp

    from ot_vae_tpu.models import VAE
    from ot_vae_tpu.networks import CNN
    from ot_vae_tpu.priors import GaussianPrior

    kw = dict(dtype=dtype) if dtype is not None else {}
    encoder = CNN(1, 256, 32, 1, capacity=8, down_sample=True, residual="add", **kw)
    decoder = CNN(128, 1, 1, 32, capacity=8, up_sample=True, residual="add", **kw)
    return VAE(metrics=None, encoder=encoder, decoder=decoder,
               prior=GaussianPrior(loss_coeff=0.1))


def _jax_throughput(batch_size=250, inner=200, repeats=3, dtype=None,
                    with_flops=False):
    """Encode+decode throughput: device-resident loop, value-fetch sync."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    model = _build_model(dtype)
    xdtype = dtype or jnp.float32
    batch = (jnp.zeros((batch_size, 32, 32, 1), xdtype),
             jnp.zeros((batch_size,), jnp.int32))
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    shape = (batch_size, 32, 32, 1)

    @jax.jit
    def fwd_n(variables, key):
        def body(i, acc):
            # fresh input per iteration: nothing is loop-invariant, so XLA
            # cannot hoist the encoder (a constant x lets CSE lift the whole
            # encode out of the loop and the "throughput" measures only the
            # decoder — the round-1 bench had this defect)
            k = jax.random.fold_in(key, i)
            x = jax.random.normal(k, shape, xdtype)
            out = model.net.apply(variables, x, 0, k, False)
            return acc + jnp.mean(out)  # full-output dependency per step
        return lax.fori_loop(0, inner, body, jnp.zeros((), jnp.float32))

    key = jax.random.PRNGKey(1)

    def call(j):  # ends in float(): the only reliable sync on this backend
        return float(fwd_n(variables, jax.random.fold_in(key, 1000 + j)))

    ips, spread = _timed_calls(call, batch_size * inner, repeats)
    out = {"img_per_s": ips, "spread_img_per_s": spread}
    if with_flops:
        # FLOPs from a single un-looped forward (cost_analysis of looped
        # executables under-reports on this backend)
        single = jax.jit(lambda v, x, k: model.net.apply(v, x, 0, k, False))
        x = jnp.zeros(shape, xdtype)
        out["flops_per_img"] = _flops_of(single, variables, x, key) / batch_size
    return out


def _train_throughput(batch_size=250, inner=100, repeats=3, dtype=None,
                      build=None, img_shape=(32, 32, 1), ref_flops=False):
    """FULL train step (fwd + bwd + adam update) throughput, device-resident.

    ``ref_flops=True`` additionally compiles the SAME architecture with the
    fused upsample-conv disabled (``OT_VAE_FUSED_UPCONV=0`` — identical
    params, materialized upsample→conv) and reports the reference
    formulation's cost-analysis FLOPs. The fused path genuinely eliminates
    MACs, so its own-FLOPs MFU drops while img/s rises; the reference
    formulation is the apples-to-apples denominator vs round ≤2 numbers and
    vs what a torch/naive-XLA implementation of this model must compute."""
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax

    model = (build or _build_model)(dtype)
    xdtype = dtype or jnp.float32
    batch = (jnp.zeros((batch_size, *img_shape), xdtype),
             jnp.zeros((batch_size,), jnp.int32))
    variables = dict(model.init_variables(jax.random.PRNGKey(0), batch))
    params = variables.pop("params")
    opt = optax.adam(1e-3)  # plain adam: same math, fori_loop-friendly state
    opt_state = opt.init(params)

    # Pre-staged batch pool: real training reads batches the host already
    # staged (transfer overlaps compute); synthesizing the input with
    # jax.random.normal INSIDE the step charged ~5% of the measured step to
    # the harness, not the model (profiled round 3: 0.5 ms of rng fusions at
    # bs32). Cycling a >1-deep pool by loop index keeps every iteration's
    # input distinct, so XLA still cannot hoist the encoder (the round-1
    # constant-input defect).
    pool = jax.random.normal(
        jax.random.PRNGKey(3), (4, batch_size, *img_shape), xdtype)

    def one_step(carry, i, key, model=model):
        params, opt_state, mutable = carry
        k = jax.random.fold_in(key, i)
        x = lax.dynamic_index_in_dim(pool, i % pool.shape[0], keepdims=False)
        pbatch = model.batch_preprocess((x, jnp.zeros((x.shape[0],), jnp.int32)),
                                        k, train=True)

        def lf(p):
            v = {"params": p, **mutable}
            loss, (logs, outputs, mutated) = model.loss_fn(
                v, pbatch, 0, {"prior": k, "dropout": k})
            return loss, mutated

        (loss, mutated), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, {**mutable, **mutated}), loss

    @jax.jit
    def train_n(params, opt_state, mutable, key):
        def body(i, carry):
            carry, _ = one_step(carry, i, key)
            return carry
        carry = lax.fori_loop(0, inner, body, (params, opt_state, mutable))
        # a scalar that depends on EVERY final parameter: forces the whole
        # chain to execute and keeps the fetch (= the sync point) tiny
        return jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)), carry[0],
            jnp.zeros((), jnp.float32))

    key = jax.random.PRNGKey(1)

    def call(j):
        return float(train_n(params, opt_state, variables,
                             jax.random.fold_in(key, 2000 + j)))

    ips, spread = _timed_calls(call, batch_size * inner, repeats)
    # FLOPs from a single un-looped train step (cost_analysis of looped
    # executables under-reports on this backend). The reduction over the
    # UPDATED params keeps the backward + optimizer alive under DCE.
    single = jax.jit(lambda p, o, m, k: jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
        one_step((p, o, m), 0, k)[0][0], jnp.zeros((), jnp.float32)))
    cost = _cost_of(single, params, opt_state, variables, key)
    flops = cost["flops"]
    flops_per_img = flops / batch_size
    tflops = flops_per_img * ips / 1e12
    out = {
        "img_per_s": ips,
        "spread_img_per_s": spread,
        "flops_per_img": flops_per_img,
        "achieved_tflop_s": tflops,
        # TPU v5e peak: 197 TFLOP/s bf16 (f32 throughput is ~half)
        "mfu_vs_bf16_peak": tflops / 197.0,
    }
    if cost["bytes"] == cost["bytes"]:  # roofline: v5e HBM ~819 GB/s
        peak = 197e12 if xdtype == jnp.bfloat16 else 98.5e12
        step_s = batch_size / ips
        out["bytes_per_img"] = cost["bytes"] / batch_size
        out["roofline_compute_s_per_step"] = flops / peak
        out["roofline_hbm_s_per_step"] = cost["bytes"] / 819e9
        out["measured_s_per_step"] = step_s
        bound = ("compute" if flops / peak >= cost["bytes"] / 819e9
                 else "hbm")
        # Self-consistency (VERDICT r4 weak #2: a step cannot beat its own
        # bound): compute FLOPs are exact (Pallas kernels report
        # CostEstimates), but XLA's bytes-accessed is an UPPER ESTIMATE —
        # it charges every fusion operand at full size even when consumers
        # share one HBM read (byte_audit.py documents the double-charge).
        # A measured step below the HBM column therefore means the
        # ESTIMATE is loose, not that the step is super-roofline.
        if step_s < min(flops / peak, cost["bytes"] / 819e9):
            bound = "hbm-upper-estimate"
            out["roofline_note"] = (
                "measured beats the cost-analysis byte estimate: XLA "
                "bytes-accessed over-counts shared reads, so the hbm "
                "column bounds traffic time from above"
            )
        out["roofline_bound"] = bound
    if ref_flops:
        import os
        os.environ["OT_VAE_FUSED_UPCONV"] = "0"
        try:
            ref_model = (build or _build_model)(dtype)
            single_ref = jax.jit(
                lambda p, o, m, k: jax.tree_util.tree_reduce(
                    lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
                    one_step((p, o, m), 0, k, model=ref_model)[0][0],
                    jnp.zeros((), jnp.float32)))
            rfpi = _flops_of(single_ref, params, opt_state, variables,
                             key) / batch_size
        finally:
            del os.environ["OT_VAE_FUSED_UPCONV"]
        out["ref_formulation_flops_per_img"] = rfpi
        out["ref_formulation_mfu_vs_bf16_peak"] = rfpi * ips / 1e12 / 197.0
    return out


def _build_big_model(dtype=None, attn_head_dim=None):
    """FFHQ128-scale CNN VAE (3→512ch @128² down to 4², attention ≤16²) —
    the MXU-bound regime the tiny MNIST model never reaches. Demonstrates
    the framework's MFU ceiling on a production-sized workload."""
    import jax.numpy as jnp

    from ot_vae_tpu.models import VAE
    from ot_vae_tpu.networks import CNN
    from ot_vae_tpu.priors import GaussianPrior

    kw = dict(dtype=dtype) if dtype is not None else {}
    encoder = CNN(3, 512, 128, 4, capacity=64, down_sample=True,
                  residual="add", attn_head_dim=attn_head_dim, **kw)
    decoder = CNN(256, 3, 4, 128, capacity=64, up_sample=True,
                  residual="add", attn_head_dim=attn_head_dim, **kw)
    return VAE(metrics=None, encoder=encoder, decoder=decoder,
               prior=GaussianPrior(loss_coeff=0.1))


def _big_bench(repeats=3):
    """Train-step MFU on the FFHQ128-scale model: f32 vs bf16, reference
    head schedule (div_sqrt: head_dim 16) vs TPU-efficient attn_head_dim=64
    (measured 2.7× whole-step; head_dim < 32 starves the MXU contraction).

    inner=150 (was 20): the axon tunnel's dispatch+fetch round-trip is
    ~67 ms/call (profiled round 3: device-op time 12.0 ms/step vs 15.4 ms
    measured wall at inner=20 — a 22% under-report). At 150 steps/call the
    RTT is <4% of the measurement."""
    import functools

    import jax.numpy as jnp

    hd64 = functools.partial(_build_big_model, attn_head_dim=64)
    common = dict(batch_size=32, inner=150, repeats=repeats,
                  img_shape=(128, 128, 3), ref_flops=True)
    return {
        "train_f32": _train_throughput(build=_build_big_model, **common),
        "train_bf16": _train_throughput(
            build=_build_big_model, dtype=jnp.bfloat16, **common),
        "train_f32_head_dim64": _train_throughput(build=hd64, **common),
        "train_bf16_head_dim64": _train_throughput(
            build=hd64, dtype=jnp.bfloat16, **common),
        # space-to-depth stem A/B (identical params; opt-in since it was
        # measured a consistent ~1.5-3% LOSS on this chip — the row keeps
        # the regression visible round over round)
        "train_bf16_head_dim64_s2d": _env_ab(
            "OT_VAE_S2D_CONV", "1", _train_throughput,
            build=hd64, dtype=jnp.bfloat16, **{**common, "ref_flops": False}),
        # the production operating point: BENCH_CLIFF.json shows the step is
        # HBM-bound at every batch size and bs128 runs at ~96% of its HBM
        # roofline (the best per-image amortization before XLA tiling
        # degrades at bs256) — this row records the headline MFU there
        "train_bf16_head_dim64_bs128": _train_throughput(
            build=hd64, dtype=jnp.bfloat16,
            **{**common, "batch_size": 128, "inner": 40}),
    }


def _env_ab(var, value, fn, **kw):
    """Run ``fn`` with ``var=value`` set, restoring the environment after."""
    import os

    prev = os.environ.get(var)
    os.environ[var] = value
    try:
        return fn(**kw)
    finally:
        if prev is None:
            del os.environ[var]
        else:
            os.environ[var] = prev


def _cliff_bench(repeats=3):
    """Per-chip batch-size scaling of the FFHQ128-scale train step (bf16,
    attn_head_dim=64 production recipe) with the XLA roofline per point —
    the round-2 review flagged throughput FALLING past bs=32 (1483 → 518
    img/s at 256) with no analysis. Each point records measured step time
    vs the compute roofline (flops / 197 TF/s) and the HBM roofline (bytes
    accessed / 819 GB/s), so the cliff's regime (remat/HBM spill vs tiling)
    is pinned by data. Writes BENCH_CLIFF.json."""
    import functools

    import jax.numpy as jnp

    hd64 = functools.partial(_build_big_model, attn_head_dim=64)
    out = {}
    for bs in (8, 16, 32, 64, 128, 256):
        inner = max(20, min(150, 4800 // bs))  # keep RTT <1% and wall bounded
        try:
            out[f"bs{bs}"] = _train_throughput(
                batch_size=bs, inner=inner, repeats=repeats, build=hd64,
                dtype=jnp.bfloat16, img_shape=(128, 128, 3))
        except Exception as e:  # OOM at the top end is itself a data point
            out[f"bs{bs}"] = {"error": str(e)[:500]}
    return out


def _build_dad_model(dtype=None):
    """Production-scale DAD (the DAD-sampling bench's model): 128² images,
    patch 8 → 16×16 = 256 token grid, dim-256 depth-6 ViT encoder/decoder,
    512-entry codebook, causally-masked dim-256 depth-6 AR decoder."""
    import jax.numpy as jnp

    from ot_vae_tpu.models import DAD
    from ot_vae_tpu.networks import AutoRegressive, ViT
    from ot_vae_tpu.priors import CodebookPrior

    # heads=2 (head_dim 128) is the round-5 recipe: the MXU lesson again —
    # d=32 quarter-fills the 128-lane contraction in the attention kernels;
    # measured 1851.7 (h8/d32) -> 2301.9 (h4/d64) -> 2606.1 img/s (h2/d128)
    # at bs32 bf16 with the shared codebook.
    cfg = dict(image_size=128, patch_size=8, dim=256, depth=6, heads=2,
               mlp_dim=1024, channels=3, dropout=0.0, emb_dropout=0.0,
               **({"dtype": dtype} if dtype is not None else {}))
    encoder = ViT(n_embed_tokens=0, output_tokens="input",
                  patch_to_embed=True, embed_to_patch=False, **cfg)
    n_tokens = encoder.total_num_tokens
    decoder = ViT(n_embed_tokens=None, n_input_tokens=n_tokens,
                  output_tokens="input", patch_to_embed=False,
                  embed_to_patch=True, **cfg)
    prior = CodebookPrior(
        latent_size=encoder.out_size, embed_dims=(2,), loss=None,
        temperature_annealing=2000, n_components=512, temperature=1e-5,
        training_mode="gumbel-softmax", inference_mode="sample",
        update_with_autograd=True,
    )
    ar = AutoRegressive(vocab_size=512, n_embed_tokens=0,
                        n_input_tokens=n_tokens, output_tokens="input",
                        patch_to_embed=False, causal_mask=True, **cfg)
    return DAD(metrics=None, encoder=encoder, decoder=decoder,
               autoregressive_decoder=ar, prior=prior)


def _build_vit_big_model(dtype=None, head_dim=64, dropout=0.0):
    """FFHQ128-scale ViT VAE: patch 4 → 32×32 = 1024 tokens (the packed-qkv
    kernel's sweet spot, T ∈ [512, 1024]), dim-512 depth-8 encoder; the
    GaussianPrior halves the feature dim so the decoder is dim-256 depth-8
    over the same 1024 tokens. ``dropout=0`` is the production recipe —
    attention-weight dropout (torch MultiheadAttention semantics) forces the
    stock attention path, and large-ViT training normally runs without it."""
    import jax.numpy as jnp

    from ot_vae_tpu.models import VAE
    from ot_vae_tpu.networks import ViT
    from ot_vae_tpu.priors import GaussianPrior

    kw = dict(dtype=dtype) if dtype is not None else {}
    encoder = ViT(image_size=128, patch_size=4, dim=512, depth=8,
                  head_dim=head_dim, channels=3, dropout=dropout,
                  n_embed_tokens=0, output_tokens="input",
                  patch_to_embed=True, **kw)
    decoder = ViT(image_size=128, patch_size=4, dim=256, depth=8,
                  head_dim=min(head_dim or 64, 128), channels=3,
                  dropout=dropout, n_embed_tokens=0,
                  n_input_tokens=encoder.total_num_tokens,
                  output_tokens="input", patch_to_embed=False,
                  embed_to_patch=True, **kw)
    return VAE(metrics=None, encoder=encoder, decoder=decoder,
               prior=GaussianPrior(loss_coeff=0.1, reparam_dim=-1))


def _build_vit_cond_model(dtype=None, dropout=0.1):
    """CIFAR-scale conditional ViT VAE (the reference's second flagship e2e,
    tests/test_conditional_vit_vae.py, at a production width): 32² images,
    patch 4 → 64 patches + 2 embed + 1 class token, dim-512 depth-6, class-
    conditional prior over the embed-token latent. T = 67 — below the fused
    kernel's win region, so this row measures the stock-XLA ViT path the
    reference shapes actually run."""
    import jax.numpy as jnp

    from ot_vae_tpu.models import VAE
    from ot_vae_tpu.networks import ViT
    from ot_vae_tpu.priors import ConditionalGaussianPrior

    kw = dict(dtype=dtype) if dtype is not None else {}
    cfg = dict(image_size=32, patch_size=4, dim=512, depth=6, heads=8,
               mlp_dim=2048, channels=3, dropout=dropout, num_classes=10, **kw)
    encoder = ViT(n_embed_tokens=2, output_tokens="embed",
                  patch_to_embed=True, embed_to_patch=False, **cfg)
    decoder = ViT(n_embed_tokens=None, n_input_tokens=1,
                  output_tokens="embed", patch_to_embed=False,
                  embed_to_patch=True, **cfg)
    prior = ConditionalGaussianPrior(
        dim=(2, 512), num_classes=10, loss_coeff=0.1, reparam_dim=-2,
        annealing_steps=1000)
    return VAE(metrics=None, encoder=encoder, decoder=decoder, prior=prior,
               conditional=True)


def _vit_bench(repeats=3):
    """Train-step throughput/MFU for the ViT model families (VERDICT r3
    Weak #2: the entire round-2/3 perf campaign targeted the CNN path; the
    ViT/DAD training paths had zero numbers). Rows:

    * ``vit128_train_{bf16,f32}`` — FFHQ128-scale ViT VAE (T=1024), fused
      packed-qkv attention default-routed at T ≥ 512,
    * ``vit128_train_bf16_no_kernel`` — A/B with OT_VAE_FUSED_ATTN=0 (stock
      XLA attention; same params) — the admit/reject evidence for routing,
    * ``vit128_train_bf16_head_dim32`` — head-schedule check (head_dim 64 vs
      32 at equal channels),
    * ``vit_cond_train_bf16`` — CIFAR-scale conditional ViT VAE (T=67,
      reference-e2e shapes; stock path by policy),
    * ``dad_train_bf16`` — production DAD train step (causally-masked AR
      decoder + gumbel codebook; stock path by policy).
    """
    import functools

    import jax.numpy as jnp

    common = dict(repeats=repeats, img_shape=(128, 128, 3))
    # head_dim 128 is the round-5 production recipe: the fused kernels'
    # T² matmuls contract over head_dim, and d=64 fills only half the
    # MXU's 128-lane contraction — measured 361.8 -> 505 img/s (1.40x) at
    # equal channels/FLOPs. hd64 stays as the A/B row.
    vit = functools.partial(_build_vit_big_model, head_dim=128)
    out = {
        "vit128_train_bf16": _train_throughput(
            build=vit, dtype=jnp.bfloat16, batch_size=32, inner=40, **common),
        "vit128_train_f32": _train_throughput(
            build=vit, batch_size=32, inner=40, **common),
        "vit128_train_bf16_no_kernel": _env_ab(
            "OT_VAE_FUSED_ATTN", "0", _train_throughput,
            build=vit, dtype=jnp.bfloat16, batch_size=32, inner=40, **common),
        "vit128_train_bf16_head_dim64": _train_throughput(
            build=functools.partial(_build_vit_big_model, head_dim=64),
            dtype=jnp.bfloat16, batch_size=32, inner=40, **common),
        "vit_cond_train_bf16": _train_throughput(
            build=_build_vit_cond_model, dtype=jnp.bfloat16, batch_size=128,
            inner=60, img_shape=(32, 32, 3), repeats=repeats),
        "dad_train_bf16": _train_throughput(
            build=_build_dad_model, dtype=jnp.bfloat16, batch_size=32,
            inner=40, **common),
    }
    return out


def _build_imagenet_model(dtype=None):
    """The configs/vae/imagenet224.yaml recipe model (reference analog:
    configs/vae/defaults_imagenet.yaml — 3×224² → 256-ch latent at 28²,
    capacity 32, batchnorm/leaky, no attention at ≥28² resolutions)."""
    import jax.numpy as jnp

    from ot_vae_tpu.models import VAE
    from ot_vae_tpu.networks import CNN
    from ot_vae_tpu.priors import GaussianPrior

    kw = dict(dtype=dtype) if dtype is not None else {}
    encoder = CNN(3, 512, 224, 28, capacity=32, down_sample=True,
                  residual="add", normalization="batchnorm",
                  activation="leaky", **kw)
    decoder = CNN(256, 3, 28, 224, capacity=32, up_sample=True,
                  residual="add", normalization="batchnorm",
                  activation="leaky", **kw)
    return VAE(metrics=None, encoder=encoder, decoder=decoder,
               prior=GaussianPrior(loss_coeff=0.1))


def _imagenet_bench(repeats=2):
    """Train-step throughput for the ImageNet224 recipe (VERDICT r4
    Missing #3: the reference config matrix's largest-resolution entry had
    no counterpart). Verifies the recipe's per-chip batch choice: the
    224² step's activation working set is ~3× the 128² one per image, so
    the sweep stops where XLA tiling degrades."""
    import jax.numpy as jnp

    out = {}
    for bs in (16, 32, 64):
        inner = max(10, 1280 // bs)
        try:
            out[f"train_bf16_bs{bs}"] = _train_throughput(
                build=_build_imagenet_model, dtype=jnp.bfloat16,
                batch_size=bs, inner=inner, repeats=repeats,
                img_shape=(224, 224, 3))
        except Exception as e:
            out[f"train_bf16_bs{bs}"] = {"error": str(e)[:300]}
    return out


def _dad_sampling_bench(repeats=3, batch_size=8):
    """KV-cached ancestral sampling tokens/s at a production 16×16 (=256)
    token grid (128² images, patch 8, dim-256 depth-6 AR decoder). The
    round-2 unrolled sampler was O(T²·depth) compute with a jaxpr ∝ T —
    255 duplicated transformer forwards at this grid made it unusable; the
    lax.scan + flax KV-cache path compiles one step and scans it."""
    import jax
    import jax.numpy as jnp

    model = _build_dad_model()
    n_tokens = model.n_tokens
    batch = (jnp.zeros((batch_size, 128, 128, 3), jnp.float32),
             jnp.zeros((batch_size,), jnp.int32))
    variables = model.init_variables(jax.random.PRNGKey(0), batch)
    fn = jax.jit(lambda v, k: model.sample_fn(v, k, batch_size, {}))
    key = jax.random.PRNGKey(1)

    def call(j):  # value-fetch sync
        return float(jnp.mean(fn(variables, jax.random.fold_in(key, 100 + j))))

    t_compile0 = time.perf_counter()
    call(-1)
    compile_s = time.perf_counter() - t_compile0
    times = []
    for j in range(repeats):
        t0 = time.perf_counter()
        call(j)
        times.append(time.perf_counter() - t0)
    med = statistics.median(times)
    return {
        "n_tokens": n_tokens,
        "batch_size": batch_size,
        "tokens_per_s": batch_size * (n_tokens - 1) / med,
        "images_per_s": batch_size / med,
        "sample_latency_s": med,
        "first_call_incl_compile_s": compile_s,
    }


def _serving_bench(repeats=50):
    """InferenceEngine request latency/QPS (pre-compiled buckets, raw→raw):
    p50 + p99 per bucket — the tail matters for serving SLOs, and on this
    remote-TPU backend the tail is dominated by tunnel RTT jitter, which a
    median alone hides."""
    import jax
    import numpy as np

    from ot_vae_tpu.data.transforms import Identity
    from ot_vae_tpu.serving import InferenceEngine

    model = _build_model()
    import jax.numpy as jnp

    batch = (jnp.zeros((8, 32, 32, 1), jnp.float32),
             jnp.zeros((8,), jnp.int32))
    model.variables = model.init_variables(jax.random.PRNGKey(0), batch)
    model.inference_preprocess = Identity()
    model.inference_postprocess = Identity()
    eng = InferenceEngine(model, batch_sizes=(1, 64)).warmup()

    out = {}
    for bs in (1, 64):
        x = np.random.rand(bs, 32, 32, 1).astype(np.float32)
        eng.reconstruct(x)  # compile the reconstruct path for this bucket
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            eng.reconstruct(x)
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        p99 = times[min(len(times) - 1, int(len(times) * 0.99))]
        out[f"reconstruct_b{bs}_p50_ms"] = med * 1e3
        out[f"reconstruct_b{bs}_p99_ms"] = p99 * 1e3
        out[f"reconstruct_b{bs}_img_per_s"] = bs / med

    # restoration endpoint (the flagship serving capability): one compiled
    # encode→transport→decode program per bucket, fitted Gaussian operator
    # over the MNIST32 latent, explicit per-request keys (round-4 serving
    # semantics — VERDICT r3 Weak #5)
    from ot_vae_tpu.transport import GaussianTransport, LatentTransport

    rng = np.random.default_rng(0)
    cb = LatentTransport(
        size=tuple(model.latent_size), transport_dims=(3,),
        transport_operator=GaussianTransport, transformations=Identity(),
        common_operator=True, operator_kwargs=dict(diag=True),
        num_samples_to_log=0,
    )
    cb.state = cb.operator.init(jax.random.PRNGKey(1))
    lat = (64, *model.latent_size)
    cb._update(jnp.asarray(rng.standard_normal(lat) + 1.0, jnp.float32),
               {"kwargs": {}}, source=True)
    cb._update(jnp.asarray(rng.standard_normal(lat), jnp.float32),
               {"kwargs": {}}, source=False)
    cb.state, _ = cb.operator.compute(cb.state, key=jax.random.PRNGKey(2))
    for bs in (1, 64):
        x = np.random.rand(bs, 32, 32, 1).astype(np.float32)
        eng.restore(x, cb, key=jax.random.PRNGKey(3))  # compile
        times = []
        for j in range(repeats):
            t0 = time.perf_counter()
            eng.restore(x, cb, key=jax.random.PRNGKey(10 + j))
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        p99 = times[min(len(times) - 1, int(len(times) * 0.99))]
        out[f"restore_b{bs}_p50_ms"] = med * 1e3
        out[f"restore_b{bs}_p99_ms"] = p99 * 1e3
        out[f"restore_b{bs}_img_per_s"] = bs / med
    return out


def _ot_core_bench(repeats=3, inner=50):
    """sqrtm (eigh vs Newton–Schulz) and Sinkhorn (XLA vs Pallas) on-device.

    Each measurement runs ``inner`` perturbed instances inside a fori_loop
    and fetches a scalar (value-fetch sync; per-op time = call / inner)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ot_vae_tpu.ops.matrix import sqrtm, sqrtm_ns
    from ot_vae_tpu.ops.w2 import (
        batch_w2_dissimilarity_gaussian,
        compute_transport_operators,
        sinkhorn_log,
        w2_gaussian,
    )

    results = {}
    key = jax.random.PRNGKey(0)

    def loop_ms(op, x0, n=inner):
        """median per-op ms of op(x) over n perturbed inputs, fetch-synced."""
        @jax.jit
        def run(x, s):
            def body(i, acc):
                out = op(x * (1.0 + 1e-6 * (s + i)))
                return acc + jnp.sum(out)
            return lax.fori_loop(0, n, body, jnp.zeros((), x.dtype))

        float(run(x0, jnp.float32(-1.0)))  # warm + drain
        times = []
        for j in range(repeats):
            t0 = time.perf_counter()
            float(run(x0, jnp.float32(j)))
            times.append(time.perf_counter() - t0)
        return statistics.median(times) * 1e3 / n

    # batched SPD sqrtm: 64 × 128×128
    m = jax.random.normal(key, (64, 128, 128), jnp.float32)
    spd = m @ jnp.swapaxes(m, -1, -2) + 128 * jnp.eye(128)
    results["sqrtm_eigh_64x128_ms"] = loop_ms(sqrtm, spd)
    results["sqrtm_newton_schulz_64x128_ms"] = loop_ms(sqrtm_ns, spd)

    # W2/Monge pipelines: eigh (spectral) vs polar (matmul-only, MXU) on the
    # GaussianTransport production shape (per-channel transport of a 128-dim
    # latent) and the GMM cost matrix (16×16 pairs of 64-dim components)
    mu = jax.random.normal(key, (64, 128)) * 0.1
    w2_in = (spd / 128.0, jnp.roll(spd / 128.0, 1, axis=0))
    for meth in ("eigh", "polar"):
        results[f"w2_gaussian_64x128_{meth}_ms"] = loop_ms(
            lambda c, meth=meth: w2_gaussian(mu, mu, c, w2_in[1], method=meth),
            w2_in[0], n=8)
        results[f"transport_ops_64x128_{meth}_ms"] = loop_ms(
            lambda c, meth=meth: compute_transport_operators(
                c, w2_in[1], stochastic=True, diag=False, method=meth)[0],
            w2_in[0], n=8)
    mg = jax.random.normal(key, (16, 64, 64), jnp.float32)
    gmm_cov = mg @ jnp.swapaxes(mg, -1, -2) + 64 * jnp.eye(64)
    gmm_mu = jax.random.normal(key, (16, 64))
    for meth in ("eigh", "polar"):
        results[f"gmm_cost_16x16x64_{meth}_ms"] = loop_ms(
            lambda c, meth=meth: batch_w2_dissimilarity_gaussian(
                gmm_mu, gmm_mu, c, jnp.roll(c, 1, 0), make_pd=True, method=meth),
            gmm_cov, n=8)

    # Sinkhorn 512×512 log-domain (the op is ~29 ms, so fewer instances)
    ka, kb = jax.random.split(key)
    a = jax.random.normal(ka, (512, 16))
    b = jax.random.normal(kb, (512, 16))
    cost = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, -1)
    unif = jnp.full((512,), 1.0 / 512)

    results["sinkhorn_xla_512_ms"] = loop_ms(
        lambda c: sinkhorn_log(unif, unif, c, 1.0, max_iter=200), cost, n=3)
    try:
        from ot_vae_tpu.ops.sinkhorn_pallas import sinkhorn_log_pallas

        results["sinkhorn_pallas_512_ms"] = loop_ms(
            lambda c: sinkhorn_log_pallas(
                unif[None], unif[None], c[None], 1.0, max_iter=200),
            cost, n=3)
    except Exception as e:
        results["sinkhorn_pallas_512_ms"] = f"unavailable: {e}"
    return results


def _torch_cpu_throughput(batch_size=250, iters=5, warmup=2, runs=3):
    """The reference's compute path on CPU: equivalent torch CNN VAE
    (encode+decode with the same channel schedule, NCHW).

    MEDIAN-of-``runs``, symmetric with the TPU-side median (round-2 used
    best-of-runs for this denominator, which pushed the headline ratio up;
    flagged by the round-2 advisor). The single-core host is noisy and this
    number is the DENOMINATOR of the headline vs_baseline ratio — a 20%
    slow measurement artificially moves the ratio a full 2×
    north-star-units, hence the multiple runs."""
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
    rates = []
    with torch.no_grad():
        for _ in range(warmup):
            z = encoder(x)
            decoder(z[:, :128, :, :])
        for _ in range(runs):
            t0 = time.perf_counter()
            for _ in range(iters):
                z = encoder(x)
                decoder(z[:, :128, :, :])
            dt = time.perf_counter() - t0
            rates.append(batch_size * iters / dt)
    return statistics.median(rates)


def _measure_eval_once():
    """Child-process body: the two primary eval measurements, one JSON line."""
    import jax.numpy as jnp

    bf16 = _jax_throughput(dtype=jnp.bfloat16)["img_per_s"]
    f32 = _jax_throughput()["img_per_s"]
    print(json.dumps({"bf16": bf16, "f32": f32}))


def _measure_eval_subprocess(hang_timeout_s):
    """Run ``bench.py --measure-eval`` in a subprocess, killed on timeout.

    Subprocess isolation is the ONLY reliable hang bound here: a wedged
    axon tunnel blocks inside a C++ RPC that never returns, and CPython
    only delivers SIGALRM between bytecodes — an in-process watchdog
    never fires. A killed subprocess always does.
    """
    import os
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--measure-eval"],
        capture_output=True, text=True, timeout=hang_timeout_s,
    )
    if proc.returncode != 0:
        tail = (proc.stderr or proc.stdout or "").strip().splitlines()[-8:]
        raise RuntimeError(
            f"measure-eval child exited rc={proc.returncode}: "
            + " | ".join(tail)
        )
    line = proc.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    return float(d["bf16"]), float(d["f32"])


def _tpu_eval_with_retry(retries=2, wait_s=45, hang_timeout_s=600,
                         run_once=None):
    """Run the two primary eval measurements with fault tolerance.

    The axon TPU client has two observed failure modes that must not zero
    out the round's bench record: (a) transient FAILED_PRECONDITION "libtpu
    version mismatch" raised during rolling upgrades (killed the
    MULTICHIP_r01/r02 gates), retried here; (b) a HANG on a wedged tunnel
    (either at first compile or at dispatch — both observed), bounded by
    running each attempt in a kill-on-timeout subprocess.
    Returns (bf16_img_per_s, f32_img_per_s, None) on success, or
    (nan, nan, last_error) after all retries fail.
    """
    if run_once is None:
        run_once = lambda: _measure_eval_subprocess(hang_timeout_s)  # noqa: E731
    last_err = None
    for attempt in range(retries):
        try:
            bf16, f32 = run_once()
            return bf16, f32, None
        except Exception as e:  # noqa: BLE001 — any client fault or timeout
            last_err = e
        if attempt < retries - 1:
            time.sleep(wait_s)
    return float("nan"), float("nan"), last_err


def _last_committed_eval():
    """(bf16, f32) img/s from the committed BENCH_DETAIL.json, else NaNs."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_DETAIL.json")
    try:
        with open(path) as f:
            d = json.load(f)
        return (float(d["eval_bf16"]["img_per_s"]),
                float(d["eval_f32"]["img_per_s"]))
    except Exception:
        return float("nan"), float("nan")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--detail", action="store_true",
                        help="also write BENCH_DETAIL.json")
    parser.add_argument("--big", action="store_true",
                        help="also bench the FFHQ128-scale model (slow)")
    parser.add_argument("--cliff", action="store_true",
                        help="also sweep per-chip batch size with rooflines")
    parser.add_argument("--vit", action="store_true",
                        help="also bench ViT/DAD train steps (slow)")
    parser.add_argument("--imagenet", action="store_true",
                        help="also bench the ImageNet224 recipe train step")
    parser.add_argument("--measure-eval", action="store_true",
                        help=argparse.SUPPRESS)  # internal child mode
    args = parser.parse_args()

    if args.measure_eval:
        _measure_eval_once()
        return

    if args.big:
        big = _big_bench()
        with open("BENCH_BIG.json", "w") as f:
            json.dump(big, f, indent=2, default=str)

    if args.cliff:
        cliff = _cliff_bench()
        with open("BENCH_CLIFF.json", "w") as f:
            json.dump(cliff, f, indent=2, default=str)

    if args.vit:
        vit = _vit_bench()
        fused, stock = vit.get("vit128_train_bf16"), vit.get(
            "vit128_train_bf16_no_kernel")
        if fused and stock and "img_per_s" in fused and "flops_per_img" in stock:
            # dual-MFU convention (see _train_throughput ref_flops): the
            # fused kernels genuinely eliminate the T² logits traffic and
            # cost-model differently; the stock-XLA formulation's FLOPs are
            # the apples-to-apples denominator
            fused["ref_formulation_flops_per_img"] = stock["flops_per_img"]
            fused["ref_formulation_mfu_vs_bf16_peak"] = (
                stock["flops_per_img"] * fused["img_per_s"] / 1e12 / 197.0)
        with open("BENCH_VIT.json", "w") as f:
            json.dump(vit, f, indent=2, default=str)

    if args.imagenet:
        with open("BENCH_IMAGENET.json", "w") as f:
            json.dump(_imagenet_bench(), f, indent=2, default=str)

    # Primary metric (name FIXED from round 2 on, so driver rounds are
    # comparable): the reference recipe's model/batch at THIS framework's
    # documented train/serve precision (bf16 — measured lossless on the e2e
    # PSNR, examples/bf16_quality.py), against the torch-CPU reference
    # (f32) at its median-of-runs. The same line also carries the
    # symmetric f32-vs-f32 ratio so both precisions are tracked round over
    # round in one stable record (round-2 review Weak #7).
    tpu_ips, tpu_ips_f32, tpu_err = _tpu_eval_with_retry()
    stale = tpu_err is not None
    if stale:
        # Honest fallback: the TPU client faulted (observed in the wild:
        # FAILED_PRECONDITION libtpu version mismatch during a rolling
        # upgrade killed MULTICHIP_r01/r02 gates; the plugin can also HANG
        # on a wedged tunnel). Rather than exit non-zero and record
        # nothing, report the most recent committed measurement explicitly
        # marked "stale" with the live error attached.
        tpu_ips, tpu_ips_f32 = _last_committed_eval()
    try:
        cpu_ips = _torch_cpu_throughput()
    except Exception:
        cpu_ips = float("nan")
    ratio = tpu_ips / cpu_ips if cpu_ips == cpu_ips else float("nan")
    ratio_f32 = tpu_ips_f32 / cpu_ips if cpu_ips == cpu_ips else float("nan")

    if args.detail and stale:
        print("# --detail skipped: TPU unreachable (stale primary line below)")
    elif args.detail:
        import jax.numpy as jnp

        detail = {
            "eval_f32": _jax_throughput(with_flops=True),
            "eval_bf16": _jax_throughput(dtype=jnp.bfloat16, with_flops=True),
            "train_f32": _train_throughput(),
            "train_bf16": _train_throughput(dtype=jnp.bfloat16),
            "ot_core": _ot_core_bench(),
            "serving": _serving_bench(),
            "dad_sampling_256tok": _dad_sampling_bench(),
            "torch_cpu_eval_img_per_s": cpu_ips,
        }
        for k in ("eval_f32", "eval_bf16"):
            d = detail[k]
            if d.get("flops_per_img", 0) > 0:
                d["achieved_tflop_s"] = d["flops_per_img"] * d["img_per_s"] / 1e12
                d["mfu_vs_bf16_peak"] = d["achieved_tflop_s"] / 197.0
        with open("BENCH_DETAIL.json", "w") as f:
            json.dump(detail, f, indent=2, default=str)

    line = {
        "metric": "mnist32_vae_encode_decode_throughput_bf16",
        "value": round(tpu_ips, 1) if tpu_ips == tpu_ips else None,
        "unit": "img/s/chip",
        "vs_baseline": round(ratio, 2) if ratio == ratio else None,
        "value_f32": round(tpu_ips_f32, 1) if tpu_ips_f32 == tpu_ips_f32 else None,
        "vs_baseline_f32": round(ratio_f32, 2) if ratio_f32 == ratio_f32 else None,
        "torch_cpu_f32_img_per_s": round(cpu_ips, 1) if cpu_ips == cpu_ips else None,
    }
    if stale:
        line["stale"] = True
        line["stale_reason"] = (
            f"TPU unreachable after retries ({type(tpu_err).__name__}: "
            f"{str(tpu_err)[:200]}); value is the last committed "
            f"BENCH_DETAIL measurement, NOT a live run"
        )
    print(json.dumps(line))


if __name__ == "__main__":
    main()
