"""Fused VMEM-resident multi-head attention (Pallas TPU kernel).

THE measured hot spot of production-scale CNN training in this framework:
the reference's spatial attention (reference: networks/nets_utils.py:55-82)
materializes the ``[B, H, T, T]`` logits tensor in HBM — at 128×128
FFHQ-scale that is ~134 MB per attention block and 75% of the whole
train-step time (ablation in BENCH_DETAIL.md: 61.5 ms/step with attention,
15.8 ms without). For spatial attention T = H·W ≤ ~1k, so the ENTIRE
``[T, T]`` score matrix for one (batch, head) instance fits comfortably in
VMEM — no online-softmax tiling needed, just keep the whole instance
on-chip:

* forward: one program per (batch·head): Q·Kᵀ → softmax → ·V entirely in
  VMEM, writing only the [T, d] output and the [T] logsumexp to HBM.
* backward: the standard flash-attention gradient algebra
  (P = exp(S − L);  Δ = rowsum(dO∘O);  dV = Pᵀ dO;  dS = P∘(dO Vᵀ − Δ);
  dQ = dS K;  dK = dSᵀ Q), recomputing P in VMEM from the saved logsumexp
  instead of reloading it from HBM.

HBM traffic per (b, h): reads 3·T·d + T·d, writes 2·T·d (+T) — versus the
XLA path's extra O(T²) logits write+read in BOTH passes.

MEASURED VERDICT (round 3, TPU v5e, fwd+bwd value-fetch-synced): the win
is T-dependent. At short T XLA's fused einsum lowering is already optimal
(T=256 the kernel is ≤1× XLA in both dtypes), but at the FFHQ128 decoder's
32² block (b32·h2·t1024·d64) the O(T²) HBM logits round-trip dominates the
XLA path and the kernel (matmuls in the input dtype, f32 accumulation)
wins 1.66× f32 (6.25 → 3.78 ms) and 1.53× bf16 (5.29 → 3.46 ms) for the
full fwd+bwd step; the backward alone is ~1.9-2.0×. Dispatch policy
(networks/nets_utils.py): fused by DEFAULT on TPU for T ≥ 512, einsum below;
``OT_VAE_FUSED_ATTN=1`` forces the kernel everywhere eligible, ``=0``
disables it. The separate 2.6-2.7× step-time win quoted in round-2 commit
messages came from the ``CNN(attn_head_dim=64)`` head-shape knob
(62.3 → 23.2 ms f32 profile), NOT from this kernel.

Numerics match the einsum reference to ~1e-6 f32 at test shapes (softmax
in f32 regardless of input dtype, like the XLA path;
tests/test_attention_pallas.py) and to reduction-reorder level at T=1024
on TPU (~2e-4 f32 / ~1e-3 bf16 max-abs, same order as XLA-vs-XLA rerolls).

PACKED LAYOUT (round 3): ``fused_attention_packed`` consumes the conv's
[B, T, 3·H·C] qkv projection directly (grid over batch, static in-kernel
head loop over VMEM column slices) and its VJP emits the packed dqkv —
the [B,T,H,C]↔[B,H,T,C] transposes and dq/dk/dv re-assembly around the
BHTC kernel were ~0.2 ms HBM layout copies each at the bs128 production
point. Measured (TPU v5e, b128·h2·t1024·d64 bf16, fwd+bwd,
value-fetch-synced): 3.87 ms packed vs 5.00 ms BHTC+transposes (1.29×)
vs 6.44 ms einsum (1.66×); outputs bit-identical to the BHTC kernel.
``spatial_attention`` dispatches to the packed kernel; the BHTC entry
point stays for odd head dims and as the oracle in tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = [
    "fused_attention",
    "fused_attention_available",
    "fused_attention_packed",
    "fused_attention_packed_available",
    "fused_attention_block",
    "fused_attention_block_available",
    "fused_attention_bthd",
    "fused_attention_bthd_dropout",
    "fused_attention_bthd_available",
]

# per-instance VMEM budget: the backward pass holds scores/P/dP [T,T] f32
# (~4 MB each at T=1024) plus q/k/v/o/do [T,d] in ~16 MB of VMEM — T=1024
# fits with double-buffering headroom, T=2048 would need 16.8 MB for the
# f32 scores ALONE and cannot compile VMEM-resident. Spatial-attention T is
# a square resolution (256/1024/4096), so the window [512, 1024] is exactly
# the shapes where the kernel was measured to win (1.76x at T=1024).
_MAX_T = 1024
_MAX_D = 128


def _attn_cost(n_instances: int, t: int, d: int, itemsize: int,
               backward: bool) -> "pl.CostEstimate":
    """True cost of one fused-attention pallas_call, reported to XLA
    (``cost_estimate``) so ``compiled.cost_analysis()`` — the denominator
    of every roofline column in bench.py — includes the kernel's internal
    matmul FLOPs and its HBM I/O. Without this, custom calls cost ZERO in
    XLA's model: round 4's ViT/DAD rows claimed HBM bounds their measured
    steps "beat" (VERDICT r4 weak #2 — an impossible roofline is a
    bookkeeping bug, not a fast step).

    Forward: 2 matmuls (QKᵀ, PV) = 4·T²·d FLOPs + T² exp per instance;
    reads q/k/v, writes o + f32 lse. Backward: 5 matmuls (S recompute,
    dV, dP, dQ, dK) = 10·T²·d + T² exp; reads q/k/v/o/do + lse, writes
    dq/dk/dv."""
    if backward:
        flops = n_instances * 10 * t * t * d
        io_elems = n_instances * (8 * t * d)
    else:
        flops = n_instances * 4 * t * t * d
        io_elems = n_instances * (4 * t * d)
    return pl.CostEstimate(
        flops=flops,
        bytes_accessed=io_elems * itemsize + n_instances * t * 4,
        transcendentals=n_instances * t * t,
    )


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float):
    # MXU multiplies run in the INPUT dtype with f32 accumulation
    # (preferred_element_type) — up-casting bf16 operands to f32 first would
    # halve MXU throughput and is NOT what the XLA einsum path does (it
    # multiplies bf16 directly); softmax statistics stay f32 either way.
    q = q_ref[0]  # [T, d]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [T, T] f32
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.dot(
        (p / denom).astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    o_ref[0] = o.astype(o_ref.dtype)
    l_ref[0] = (m + jnp.log(denom)).astype(l_ref.dtype)  # [T, 1]


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale: float):
    # Matmul operands stay in the input dtype (f32 accumulation) — same
    # rationale as the forward kernel: for bf16 inputs all five matmuls run
    # at the MXU's bf16 rate, exactly like the gradients XLA derives for the
    # einsum path; the softmax/ds algebra between them stays f32.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    lse = l_ref[0].astype(jnp.float32)  # [T, 1]
    do = do_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    p = jnp.exp(s - lse)  # [T, T] f32, rows sum to 1
    delta = jnp.sum(  # [T, 1] f32 (elementwise — VPU, keep full precision)
        do_ref[0].astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=-1, keepdims=True)
    dv = jax.lax.dot_general(  # Pᵀ dO → [T, d]
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(  # dO Vᵀ → [T, T]
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = (p * (dp - delta) * scale).astype(q.dtype)
    dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(  # dSᵀ Q → [T, d]
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _instance_spec(t, d):
    return pl.BlockSpec((1, t, d), lambda i: (i, 0, 0))


def _lse_spec(t):
    # 3-D (1, t, 1) block: Mosaic requires the last two block dims divisible
    # by (8, 128) OR equal to the array dims — (t, 1) satisfies via equality
    return pl.BlockSpec((1, t, 1), lambda i: (i, 0, 0))


def _fwd_call(q, k, v, scale, interpret):
    n, t, d = q.shape
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(n,),
        in_specs=[_instance_spec(t, d)] * 3,
        out_specs=(_instance_spec(t, d), _lse_spec(t)),
        out_shape=(
            jax.ShapeDtypeStruct((n, t, d), q.dtype),
            jax.ShapeDtypeStruct((n, t, 1), jnp.float32),
        ),
        cost_estimate=_attn_cost(n, t, d, q.dtype.itemsize, backward=False),
        interpret=interpret,
    )(q, k, v)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused(q, k, v, scale, interpret):
    return _fwd_call(q, k, v, scale, interpret)[0]


def _fused_fwd(q, k, v, scale, interpret):
    out, lse = _fwd_call(q, k, v, scale, interpret)
    return out, (q, k, v, out, lse)


def _fused_bwd(scale, interpret, res, do):
    q, k, v, out, lse = res
    n, t, d = q.shape
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(n,),
        in_specs=[_instance_spec(t, d)] * 4 + [_lse_spec(t),
                                               _instance_spec(t, d)],
        out_specs=(_instance_spec(t, d),) * 3,
        out_shape=(
            jax.ShapeDtypeStruct((n, t, d), q.dtype),
            jax.ShapeDtypeStruct((n, t, d), k.dtype),
            jax.ShapeDtypeStruct((n, t, d), v.dtype),
        ),
        cost_estimate=_attn_cost(n, t, d, q.dtype.itemsize, backward=True),
        interpret=interpret,
    )(q, k, v, out, lse, do)
    return dq, dk, dv


_fused.defvjp(_fused_fwd, _fused_bwd)


def fused_attention_available(t: int, d: int) -> bool:
    """Shape window where the whole [T, T] instance fits VMEM."""
    return t <= _MAX_T and d <= _MAX_D


# ---------------------------------------------------------------------------
# Packed-qkv layout: the kernel consumes the conv's [B, T, 3·H·C] projection
# DIRECTLY (one program per batch element, static loop over heads slicing
# columns in VMEM) and its VJP emits the packed [B, T, 3·H·C] gradient the
# projection's backward wants. Rationale (round-3 bs128 profile,
# examples/profile_step.py): the [B,T,H,C]↔[B,H,T,C] head transposes and the
# dq/dk/dv→dqkv re-assembly around the BHTC kernel were pure layout copies —
# ~0.2 ms EACH on 33 MB tensors, several per attention block per pass,
# 16% of the whole FFHQ128-scale train step in the `copy` category. The
# packed kernel makes every one of them structurally impossible: HBM holds
# only qkv/o/do/dqkv in the conv's native layout.
# ---------------------------------------------------------------------------


def _head_slices(width: int, n_heads: int, h: int):
    """Column ranges of head ``h``'s q, k, v inside packed [.., 3·H·C]."""
    ch = width // (3 * n_heads)
    c = n_heads * ch
    qs = slice(h * ch, (h + 1) * ch)
    ks = slice(c + h * ch, c + (h + 1) * ch)
    vs = slice(2 * c + h * ch, 2 * c + (h + 1) * ch)
    return qs, ks, vs


def _fwd_kernel_packed(qkv_ref, o_ref, l_ref, *, scale: float, n_heads: int):
    # Same math as _fwd_kernel, per head, on column slices of the packed
    # block. The head loop is a static Python loop (n_heads is trace-time);
    # Mosaic frees each head's [T, T] scratch between iterations so peak
    # VMEM matches the single-head kernel.
    width = qkv_ref.shape[-1]
    for h in range(n_heads):
        qs, ks, vs = _head_slices(width, n_heads, h)
        q = qkv_ref[0, :, qs]  # [T, C]
        k = qkv_ref[0, :, ks]
        v = qkv_ref[0, :, vs]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [T, T] f32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(
            (p / denom).astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, :, qs] = o.astype(o_ref.dtype)
        l_ref[0, :, h:h + 1] = (m + jnp.log(denom)).astype(l_ref.dtype)


def _bwd_kernel_packed(qkv_ref, o_ref, l_ref, do_ref, dqkv_ref,
                       *, scale: float, n_heads: int):
    # Flash-attention gradient algebra per head (see _bwd_kernel), writing
    # dq/dk/dv straight into the packed dqkv column layout.
    width = qkv_ref.shape[-1]
    for h in range(n_heads):
        qs, ks, vs = _head_slices(width, n_heads, h)
        q = qkv_ref[0, :, qs]
        k = qkv_ref[0, :, ks]
        v = qkv_ref[0, :, vs]
        o = o_ref[0, :, qs]
        do = do_ref[0, :, qs]
        lse = l_ref[0, :, h:h + 1].astype(jnp.float32)  # [T, 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse)  # [T, T] f32, rows sum to 1
        delta = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32),
            axis=-1, keepdims=True)
        dv = jax.lax.dot_general(  # Pᵀ dO → [T, C]
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(  # dO Vᵀ → [T, T]
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(  # dSᵀ Q → [T, C]
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqkv_ref[0, :, qs] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, ks] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, vs] = dv.astype(dqkv_ref.dtype)


def _packed_spec(t, width):
    return pl.BlockSpec((1, t, width), lambda i: (i, 0, 0))


def _packed_lse_spec(t, n_heads):
    # block == array dims on the last two axes → satisfies Mosaic's layout
    # rule regardless of n_heads (same equality argument as _lse_spec)
    return pl.BlockSpec((1, t, n_heads), lambda i: (i, 0, 0))


def _packed_fwd_call(qkv, n_heads, scale, interpret):
    b, t, width = qkv.shape
    c = width // 3
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, scale=scale, n_heads=n_heads),
        grid=(b,),
        in_specs=[_packed_spec(t, width)],
        out_specs=(_packed_spec(t, c), _packed_lse_spec(t, n_heads)),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
            jax.ShapeDtypeStruct((b, t, n_heads), jnp.float32),
        ),
        cost_estimate=_attn_cost(b * n_heads, t, c // n_heads,
                                 qkv.dtype.itemsize, backward=False),
        interpret=interpret,
    )(qkv)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_packed(qkv, n_heads, scale, interpret):
    return _packed_fwd_call(qkv, n_heads, scale, interpret)[0]


def _fused_packed_fwd(qkv, n_heads, scale, interpret):
    out, lse = _packed_fwd_call(qkv, n_heads, scale, interpret)
    return out, (qkv, out, lse)


def _fused_packed_bwd(n_heads, scale, interpret, res, do):
    qkv, out, lse = res
    b, t, width = qkv.shape
    c = width // 3
    dqkv = pl.pallas_call(
        functools.partial(_bwd_kernel_packed, scale=scale, n_heads=n_heads),
        grid=(b,),
        in_specs=[
            _packed_spec(t, width),   # qkv
            _packed_spec(t, c),       # o
            _packed_lse_spec(t, n_heads),
            _packed_spec(t, c),       # do
        ],
        out_specs=_packed_spec(t, width),
        out_shape=jax.ShapeDtypeStruct((b, t, width), qkv.dtype),
        cost_estimate=_attn_cost(b * n_heads, t, width // (3 * n_heads),
                                 qkv.dtype.itemsize, backward=True),
        interpret=interpret,
    )(qkv, out, lse, do)
    return (dqkv,)


_fused_packed.defvjp(_fused_packed_fwd, _fused_packed_bwd)


def fused_attention_packed_available(
    t: int, d: int, n_heads: int = None, itemsize: int = None,
) -> bool:
    """Shape window for the packed-qkv kernel.

    Same VMEM window as the BHTC kernel plus a lane-alignment requirement:
    in-VMEM column slices land on lane boundaries when the head dim is a
    multiple of 8 (Mosaic relayouts cover the rest, but 8 keeps the slices
    on native sublane×lane tiles for bf16/f32 alike).

    When ``n_heads``/``itemsize`` are known, a TOTAL-WIDTH envelope applies:
    the packed kernel runs one program per batch element with the whole
    [T, 3·H·C] qkv (+ packed dqkv, o, do) resident, so its backward working
    set grows with H·C on top of the per-head [T,T] f32 intermediates.
    Empirical VMEM anchor (v5e, 16 MB scoped limit): t·H·C·itemsize ≤ 0.5 MB
    — the measured-good CNN production shape (t1024·h2·c64 f32 = 0.5 MB)
    compiles at ~16 MB, while the ViT-encoder shape (t1024·h8·c64 bf16
    = 1 MB) was rejected by Mosaic at 25.8 MB (round-4 ViT campaign). Wider
    shapes route to the per-(batch·head) BHTC kernel instead
    (``nets_utils.mha_attention_fn``), which holds one head's [T,d] + [T,T]
    regardless of H.
    """
    if not (t <= _MAX_T and d <= _MAX_D and d % 8 == 0):
        return False
    if n_heads is not None and itemsize is not None:
        # d floored at 64: narrow per-head column slices still occupy full
        # lane tiles in VMEM, so 8 heads of d=32 cost like 8 heads of d≥64
        # (measured: h8·d32·t1024 bf16 [width 768] was Mosaic-rejected at
        # 16.89 MB although its nominal t·H·C·itemsize is exactly 0.5 MB).
        return t * n_heads * max(d, 64) * itemsize <= 512 * 1024
    return True


# ---------------------------------------------------------------------------
# Fully-fused attention BLOCK: qkv projection + attention + output projection
# in one kernel. The AttentionBlock (networks/cnn.py; reference:
# networks/cnn.py:212-240) is norm → 1×1 qkv conv (no bias) → attention →
# 1×1 out conv (no bias); a 1×1 conv is a plain matmul over flattened
# spatial positions, so the whole block after the norm is three matmuls +
# softmax per (batch, head). Fusing them keeps qkv [T, 3·H·C] and the
# attention output [T, H·C] entirely in VMEM: at the FFHQ128 production
# point (bs128, 32² block, C=128) the packed qkv tensor alone is ~100 MB
# bf16 — its HBM write+read in BOTH passes (plus the packed dqkv round
# trip in the backward) is avoided.
#
# MEASURED VERDICT (v5e, 2026-08): the saved bandwidth does NOT pay for
# re-running the projection matmuls once per grid program instead of as
# one XLA-batched GEMM — bs128 t1024 c128 h2: 4.25 ms fused vs 3.65 ms
# proj+packed (vs 8.74 ms all-XLA); bs128 t256 c512 h8: 3.52 vs 2.79
# (vs 4.09). The block kernel is therefore OPT-IN
# (OT_VAE_FUSED_ATTN_BLOCK=1 in networks/cnn.py); the default production
# path is XLA projections + fused_attention_packed.
#
# Backward: dW_qkv = Σ_b xᵀ·dqkv and dW_out = Σ_b attnᵀ·dout are
# accumulated ACROSS grid programs into constant-index output blocks
# (TPU grids are sequential — the f32 accumulators live in VMEM for the
# whole kernel, zero-initialized at program 0). qkv and the per-head
# attention outputs are recomputed in VMEM from the saved logsumexp,
# flash-attention style, so the only residuals are x and lse.
# ---------------------------------------------------------------------------


def _block_fwd_kernel(x_ref, wqkv_ref, wout_ref, o_ref, l_ref,
                      *, scale: float, n_heads: int):
    x = x_ref[0]  # [T, C]
    # weights arrive in their STORAGE dtype (f32 master params for the
    # nn.Conv-parity branch) and are cast to the compute dtype here — the
    # matmuls run at the input rate exactly like nn.Conv(dtype=...), and
    # the VJP below can emit f32 weight grads with no bf16 truncation
    wqkv = wqkv_ref[...].astype(x.dtype)
    wout = wout_ref[...].astype(x.dtype)
    qkv = jax.lax.dot_general(  # [T, 3·H·ch] in x's dtype (f32 accumulation)
        x, wqkv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    width = qkv.shape[-1]
    cp = width // 3  # H·ch
    ch = cp // n_heads
    acc = jnp.zeros((x.shape[0], wout.shape[-1]), jnp.float32)
    for h in range(n_heads):
        qs, ks, vs = _head_slices(width, n_heads, h)
        q, k, v = qkv[:, qs], qkv[:, ks], qkv[:, vs]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        attn_h = jnp.dot(  # [T, ch]
            (p / denom).astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        # out += attn_h @ W_out[h·ch:(h+1)·ch, :] — heads never concatenated
        acc = acc + jax.lax.dot_general(
            attn_h, wout[h * ch:(h + 1) * ch, :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        l_ref[0, :, h:h + 1] = (m + jnp.log(denom)).astype(l_ref.dtype)
    o_ref[0] = acc.astype(o_ref.dtype)


def _block_bwd_kernel(x_ref, wqkv_ref, wout_ref, l_ref, do_ref,
                      dx_ref, dwqkv_ref, dwout_ref,
                      *, scale: float, n_heads: int):
    # zero the cross-program weight-gradient accumulators once
    @pl.when(pl.program_id(0) == 0)
    def _init():
        dwqkv_ref[...] = jnp.zeros_like(dwqkv_ref)
        dwout_ref[...] = jnp.zeros_like(dwout_ref)

    x = x_ref[0]           # [T, C]
    do = do_ref[0]         # [T, C_out]
    wqkv = wqkv_ref[...].astype(x.dtype)
    wout = wout_ref[...].astype(x.dtype)
    qkv = jax.lax.dot_general(  # recompute (cheap vs its HBM round trip)
        x, wqkv, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    width = qkv.shape[-1]
    cp = width // 3
    ch = cp // n_heads
    dqs, dks, dvs = [], [], []
    for h in range(n_heads):
        qs, ks, vs = _head_slices(width, n_heads, h)
        q, k, v = qkv[:, qs], qkv[:, ks], qkv[:, vs]
        lse = l_ref[0, :, h:h + 1].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse)  # [T, T] f32, rows sum to 1
        attn_h = jnp.dot(  # recomputed forward head output [T, ch]
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        w_out_h = wout[h * ch:(h + 1) * ch, :]  # [ch, C_out]
        # dW_out rows for this head: attn_hᵀ · dO
        dwout_ref[h * ch:(h + 1) * ch, :] += jax.lax.dot_general(
            attn_h, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        do_h = jax.lax.dot_general(  # dAttn_h = dO · W_out_hᵀ → [T, ch]
            do, w_out_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        delta = jnp.sum(
            do_h.astype(jnp.float32) * attn_h.astype(jnp.float32),
            axis=-1, keepdims=True)
        dv = jax.lax.dot_general(  # Pᵀ dAttn_h → [T, ch]
            p.astype(do_h.dtype), do_h, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(  # dAttn_h Vᵀ → [T, T]
            do_h, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = (p * (dp - delta) * scale).astype(x.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqs.append(dq)
        dks.append(dk)
        dvs.append(dv)
    # assemble packed [T, 3·H·ch] gradient by static concat (q heads | k
    # heads | v heads — Mosaic has no scatter; concat of static slices is
    # a pure VMEM relayout)
    dqkv_c = jnp.concatenate(dqs + dks + dvs, axis=1).astype(x.dtype)
    dx_ref[0] = jax.lax.dot_general(  # dX = dQKV · W_qkvᵀ
        dqkv_c, wqkv, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dx_ref.dtype)
    dwqkv_ref[...] += jax.lax.dot_general(  # dW_qkv += Xᵀ · dQKV
        x, dqkv_c, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _w_spec(shape):
    return pl.BlockSpec(shape, lambda i: (0, 0))


def _block_fwd_call(x, w_qkv, w_out, n_heads, scale, interpret):
    b, t, c = x.shape
    width = w_qkv.shape[-1]
    c_out = w_out.shape[-1]
    out, lse = pl.pallas_call(
        functools.partial(_block_fwd_kernel, scale=scale, n_heads=n_heads),
        grid=(b,),
        in_specs=[
            _packed_spec(t, c),
            _w_spec(w_qkv.shape),
            _w_spec(w_out.shape),
        ],
        out_specs=(_packed_spec(t, c_out), _packed_lse_spec(t, n_heads)),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c_out), x.dtype),
            jax.ShapeDtypeStruct((b, t, n_heads), jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            # attention + the two in-kernel projections, per batch program
            flops=b * (4 * t * t * (width // 3)
                       + 2 * t * c * width + 2 * t * (width // 3) * c_out),
            bytes_accessed=(b * (2 * t * c + t * n_heads * 4)
                            * x.dtype.itemsize
                            + b * (w_qkv.size + w_out.size) * 4),
            transcendentals=b * n_heads * t * t,
        ),
        interpret=interpret,
    )(x, w_qkv, w_out)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fused_block(x, w_qkv, w_out, n_heads, scale, interpret):
    return _block_fwd_call(x, w_qkv, w_out, n_heads, scale, interpret)[0]


def _fused_block_fwd(x, w_qkv, w_out, n_heads, scale, interpret):
    out, lse = _block_fwd_call(x, w_qkv, w_out, n_heads, scale, interpret)
    return out, (x, w_qkv, w_out, lse)


def _fused_block_bwd(n_heads, scale, interpret, res, do):
    x, w_qkv, w_out, lse = res
    b, t, c = x.shape
    dx, dwqkv, dwout = pl.pallas_call(
        functools.partial(_block_bwd_kernel, scale=scale, n_heads=n_heads),
        grid=(b,),
        in_specs=[
            _packed_spec(t, c),
            _w_spec(w_qkv.shape),
            _w_spec(w_out.shape),
            _packed_lse_spec(t, n_heads),
            _packed_spec(t, w_out.shape[-1]),
        ],
        out_specs=(
            _packed_spec(t, c),
            _w_spec(w_qkv.shape),
            _w_spec(w_out.shape),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, c), x.dtype),
            jax.ShapeDtypeStruct(w_qkv.shape, jnp.float32),
            jax.ShapeDtypeStruct(w_out.shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            # attention bwd algebra + qkv recompute + the four projection
            # grads/transposes, per batch program
            flops=b * (10 * t * t * (w_qkv.shape[-1] // 3)
                       + 4 * t * c * w_qkv.shape[-1]
                       + 4 * t * (w_qkv.shape[-1] // 3) * w_out.shape[-1]),
            bytes_accessed=(b * (3 * t * c) * x.dtype.itemsize
                            + b * (w_qkv.size + w_out.size) * 4
                            + (w_qkv.size + w_out.size) * 4),
            transcendentals=b * n_heads * t * t,
        ),
        interpret=interpret,
    )(x, w_qkv, w_out, lse, do)
    return dx, dwqkv.astype(w_qkv.dtype), dwout.astype(w_out.dtype)


_fused_block.defvjp(_fused_block_fwd, _fused_block_bwd)


# ---------------------------------------------------------------------------
# BTHD layout (round 5): three separate q/k/v inputs in [B, T, H·d] — the
# layout flax MultiHeadDotProductAttention's DenseGeneral projections emit
# NATIVELY ([B, T, H, d] is a free bitcast away). The round-4 ViT dispatch
# paid real HBM for adapting to the other kernels' layouts: the packed
# kernel needed a [B,T,3·H·d] concat (~0.9 ms per decoder layer at vit128
# bs32) and the BHTC kernel needed [B,T,H,d]→[B,H,T,d] transposes of
# q/k/v/o/do (~10 ms/step total in the `copy` category of the vit128
# profile). This kernel grids over (batch, head-group) and slices each
# head's columns INSIDE VMEM, so none of those relayouts exist: HBM only
# ever holds the projections' native tensors.
#
# Head-group width is pinned to the 128-element lane tile
# (heads_per_block = 128 // d), which keeps every q/k/v block [T, 128] —
# the same per-program working set at any H, and lane-aligned column
# slices for free. The logsumexp residual is carried as [B, H, T, 1]
# (block (1, hg, t, 1) — last-two-dims rule satisfied by equality, same
# trick as _lse_spec).
# ---------------------------------------------------------------------------


def _bthd_slices(d: int, h: int):
    return slice(h * d, (h + 1) * d)


def _causal_neg(tq: int, tk: int):
    """Additive mask [tq, tk]: 0 on/below the diagonal, -inf above (query i
    attends keys ≤ i; equal lengths assumed by the caller)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, tk), 1)
    return jnp.where(col > row, -jnp.inf, 0.0).astype(jnp.float32)


def _fwd_kernel_bthd(*refs, scale: float, d: int, hg: int, causal: bool,
                     has_mult: bool):
    if has_mult:
        mult_ref, q_ref, k_ref, v_ref, o_ref, l_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref, l_ref = refs
        mult_ref = None
    neg = _causal_neg(q_ref.shape[1], k_ref.shape[1]) if causal else None
    for h in range(hg):
        cs = _bthd_slices(d, h)
        q = q_ref[0, :, cs]  # [Tq, d]
        k = k_ref[0, :, cs]  # [Tk, d]
        v = v_ref[0, :, cs]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [Tq, Tk] f32
        if causal:
            s = s + neg
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        pw = p / denom
        if has_mult:
            # post-softmax dropout multiplier (mask/keep_prob, flax
            # broadcast-dropout semantics: ONE [Tq,Tk] shared by every
            # (batch, head) — bit-identical to the stock path's mask)
            pw = pw * mult_ref[...].astype(jnp.float32)
        o = jnp.dot(
            pw.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        o_ref[0, :, cs] = o.astype(o_ref.dtype)
        l_ref[0, h, :, :] = (m + jnp.log(denom)).astype(l_ref.dtype)


def _bwd_kernel_bthd(*refs, scale: float, d: int, hg: int, causal: bool,
                     has_mult: bool):
    if has_mult:
        (mult_ref, q_ref, k_ref, v_ref, o_ref, l_ref, do_ref,
         dq_ref, dk_ref, dv_ref) = refs
    else:
        (q_ref, k_ref, v_ref, o_ref, l_ref, do_ref,
         dq_ref, dk_ref, dv_ref) = refs
        mult_ref = None
    neg = _causal_neg(q_ref.shape[1], k_ref.shape[1]) if causal else None
    for h in range(hg):
        cs = _bthd_slices(d, h)
        q = q_ref[0, :, cs]
        k = k_ref[0, :, cs]
        v = v_ref[0, :, cs]
        o = o_ref[0, :, cs]
        do = do_ref[0, :, cs]
        lse = l_ref[0, h, :, :].astype(jnp.float32)  # [Tq, 1]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        if causal:
            s = s + neg
        p = jnp.exp(s - lse)  # [Tq, Tk] f32, rows sum to 1
        pd = p * mult_ref[...].astype(jnp.float32) if has_mult else p
        delta = jnp.sum(
            do.astype(jnp.float32) * o.astype(jnp.float32),
            axis=-1, keepdims=True)
        dv = jax.lax.dot_general(  # Pdᵀ dO → [Tk, d]
            pd.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(  # dO Vᵀ → [Tq, Tk]
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if has_mult:
            dp = dp * mult_ref[...].astype(jnp.float32)
        ds = (p * (dp - delta) * scale).astype(q.dtype)
        dq = jnp.dot(ds, k, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(  # dSᵀ Q → [Tk, d]
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dq_ref[0, :, cs] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, cs] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, cs] = dv.astype(dv_ref.dtype)


def _bthd_spec(t, w):
    return pl.BlockSpec((1, t, w), lambda i, j: (i, 0, j))


def _bthd_lse_spec(hg, t):
    return pl.BlockSpec((1, hg, t, 1), lambda i, j: (i, j, 0, 0))


def _mult_spec(tq, tk):
    return pl.BlockSpec((tq, tk), lambda i, j: (0, 0))


def _heads_per_block(d: int, n_heads: int) -> int:
    if n_heads * d <= 128:
        # one block spans every head: block width == array width, which
        # satisfies Mosaic's last-dim rule by equality at any size
        return n_heads
    return max(1, 128 // d)


def _bthd_fwd_call(q, k, v, mult, n_heads, scale, causal, interpret):
    b, tq, width = q.shape
    tk = k.shape[1]
    d = width // n_heads
    hg = _heads_per_block(d, n_heads)
    w = hg * d
    has_mult = mult is not None
    ins = ([_mult_spec(tq, tk)] if has_mult else []) + \
        [_bthd_spec(tq, w), _bthd_spec(tk, w), _bthd_spec(tk, w)]
    args = ([mult] if has_mult else []) + [q, k, v]
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel_bthd, scale=scale, d=d, hg=hg,
                          causal=causal, has_mult=has_mult),
        grid=(b, n_heads // hg),
        in_specs=ins,
        out_specs=(_bthd_spec(tq, w), _bthd_lse_spec(hg, tq)),
        out_shape=(
            jax.ShapeDtypeStruct((b, tq, width), q.dtype),
            jax.ShapeDtypeStruct((b, n_heads, tq, 1), jnp.float32),
        ),
        cost_estimate=_attn_cost(b * n_heads, max(tq, tk), d,
                                 q.dtype.itemsize, backward=False),
        interpret=interpret,
    )(*args)
    return out, lse


def _bthd_bwd_call(q, k, v, mult, out, lse, do, n_heads, scale, causal,
                   interpret):
    b, tq, width = q.shape
    tk = k.shape[1]
    d = width // n_heads
    hg = _heads_per_block(d, n_heads)
    w = hg * d
    has_mult = mult is not None
    ins = ([_mult_spec(tq, tk)] if has_mult else []) + \
        [_bthd_spec(tq, w), _bthd_spec(tk, w), _bthd_spec(tk, w),
         _bthd_spec(tq, w), _bthd_lse_spec(hg, tq), _bthd_spec(tq, w)]
    args = ([mult] if has_mult else []) + [q, k, v, out, lse, do]
    return pl.pallas_call(
        functools.partial(_bwd_kernel_bthd, scale=scale, d=d, hg=hg,
                          causal=causal, has_mult=has_mult),
        grid=(b, n_heads // hg),
        in_specs=ins,
        out_specs=(_bthd_spec(tq, w), _bthd_spec(tk, w), _bthd_spec(tk, w)),
        out_shape=(
            jax.ShapeDtypeStruct((b, tq, width), q.dtype),
            jax.ShapeDtypeStruct((b, tk, width), k.dtype),
            jax.ShapeDtypeStruct((b, tk, width), v.dtype),
        ),
        cost_estimate=_attn_cost(b * n_heads, max(tq, tk), d,
                                 q.dtype.itemsize, backward=True),
        interpret=interpret,
    )(*args)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused_bthd(q, k, v, n_heads, scale, causal, interpret):
    return _bthd_fwd_call(q, k, v, None, n_heads, scale, causal, interpret)[0]


def _fused_bthd_fwd(q, k, v, n_heads, scale, causal, interpret):
    out, lse = _bthd_fwd_call(q, k, v, None, n_heads, scale, causal,
                              interpret)
    return out, (q, k, v, out, lse)


def _fused_bthd_bwd(n_heads, scale, causal, interpret, res, do):
    q, k, v, out, lse = res
    return _bthd_bwd_call(q, k, v, None, out, lse, do, n_heads, scale,
                          causal, interpret)


_fused_bthd.defvjp(_fused_bthd_fwd, _fused_bthd_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_bthd_drop(q, k, v, mult, n_heads, scale, causal, interpret):
    return _bthd_fwd_call(q, k, v, mult, n_heads, scale, causal,
                          interpret)[0]


def _fused_bthd_drop_fwd(q, k, v, mult, n_heads, scale, causal, interpret):
    out, lse = _bthd_fwd_call(q, k, v, mult, n_heads, scale, causal,
                              interpret)
    return out, (q, k, v, mult, out, lse)


def _fused_bthd_drop_bwd(n_heads, scale, causal, interpret, res, do):
    q, k, v, mult, out, lse = res
    dq, dk, dv = _bthd_bwd_call(q, k, v, mult, out, lse, do, n_heads, scale,
                                causal, interpret)
    # the dropout multiplier comes from an rng draw — nothing consumes its
    # cotangent, and the stock path's mask gets none either
    return dq, dk, dv, jnp.zeros_like(mult)


_fused_bthd_drop.defvjp(_fused_bthd_drop_fwd, _fused_bthd_drop_bwd)


def fused_attention_bthd_available(
    t: int, d: int, n_heads: int, tk: int = None,
) -> bool:
    """Shape window for the BTHD kernel: the BHTC VMEM window (for both
    sequence lengths when cross-shaped), plus either (a) all heads fit one
    128-lane block (H·d ≤ 128 — block width equals the array width), or
    (b) head dim divides the 128-lane tile and the head count splits into
    whole lane-aligned groups."""
    if not (t <= _MAX_T and d <= _MAX_D):
        return False
    if tk is not None and not tk <= _MAX_T:
        return False
    if n_heads * d <= 128:
        return True
    return 128 % d == 0 and n_heads % (128 // d) == 0


def fused_attention_bthd(
    q: jax.Array, k: jax.Array, v: jax.Array,
    n_heads: int, scale: float, interpret: bool = False,
    causal: bool = False,
) -> jax.Array:
    """softmax(scale · Q Kᵀ) V on three [B, T, H·d] inputs — the layout
    multi-head Dense projections produce natively ([B, T, H, d] is a free
    bitcast). No transposes or concats at the kernel boundary: the grid is
    (batch, head-group) and heads are VMEM column slices.

    :param q: [B, Tq, H·d], heads contiguous along the last axis
    :param k/v: [B, Tk, H·d] — cross-attention lengths allowed
    :param n_heads: number of attention heads H
    :param scale: logit scale (1/sqrt(d) in the standard parameterization)
    :param causal: apply the lower-triangular mask in-kernel (the AR
        decoder's self-attention; requires Tq == Tk)
    :return: [B, Tq, H·d] in q's dtype
    """
    b, t, width = q.shape
    assert width % n_heads == 0, (width, n_heads)
    assert k.shape == v.shape and k.shape[0] == b and k.shape[2] == width
    assert not causal or k.shape[1] == t, "causal needs equal lengths"
    return _fused_bthd(q, k, v, n_heads, float(scale), causal, interpret)


def fused_attention_bthd_dropout(
    q: jax.Array, k: jax.Array, v: jax.Array, mult: jax.Array,
    n_heads: int, scale: float, interpret: bool = False,
    causal: bool = False,
) -> jax.Array:
    """:func:`fused_attention_bthd` with a post-softmax dropout multiplier
    ``mult`` [Tq, Tk] (mask / keep_prob — flax ``broadcast_dropout``
    semantics: ONE multiplier shared across batch and heads, so its HBM
    footprint is T² — not B·H·T²). The multiplier is built OUTSIDE with
    the caller's dropout rng (bit-identical to the stock flax mask) and
    re-read in the backward, which regenerates P from the logsumexp and
    applies the identical mask — train-mode long-T attention keeps the
    kernel (VERDICT r4 #4)."""
    b, t, width = q.shape
    assert mult.shape == (t, k.shape[1]), (mult.shape, q.shape, k.shape)
    return _fused_bthd_drop(q, k, v, mult, n_heads, float(scale), causal,
                            interpret)


def fused_attention_block_available(t: int, d: int) -> bool:
    """Shape window for the fused block kernel (same as the packed kernel —
    the extra VMEM for qkv/dqkv is ~2 MB at the largest eligible shape)."""
    return fused_attention_packed_available(t, d)


def fused_attention_block(
    x: jax.Array, w_qkv: jax.Array, w_out: jax.Array,
    n_heads: int, scale: float, interpret: bool = False,
) -> jax.Array:
    """(x · W_qkv) → multi-head attention → (· W_out), all VMEM-resident.

    Equivalent to the unfused AttentionBlock minus its normalization:
    ``out = attention(x @ w_qkv) @ w_out`` with head split/merge as column
    slices. qkv, the attention output, and their gradients never touch HBM.

    :param x: [B, T, C] normalized block input
    :param w_qkv: [C, 3·H·ch] effective qkv projection weight (q|k|v blocks)
    :param w_out: [H·ch, C_out] effective output projection weight
    :param n_heads: number of attention heads H
    :param scale: logit scale (1/sqrt(ch))
    :return: [B, T, C_out] in x's dtype
    """
    b, t, c = x.shape
    width = w_qkv.shape[-1]
    assert w_qkv.shape[0] == c, (w_qkv.shape, x.shape)
    assert width % (3 * n_heads) == 0, (width, n_heads)
    assert w_out.shape[0] == width // 3, (w_out.shape, width)
    return _fused_block(x, w_qkv, w_out, n_heads, float(scale), interpret)


def fused_attention_packed(
    qkv: jax.Array, n_heads: int, scale: float, interpret: bool = False,
) -> jax.Array:
    """softmax(scale · Q Kᵀ) V on a packed [B, T, 3·H·C] qkv projection.

    Head split, transposes, and gradient re-assembly all happen as VMEM
    column slices inside the kernel — HBM only ever holds the conv's
    native packed layout (and its packed gradient).

    :param qkv: [B, T, 3·H·C] packed queries/keys/values (q block first,
        then k, then v; heads contiguous inside each block — the layout
        ``spatial_attention`` receives from the qkv projection)
    :param n_heads: number of attention heads H
    :param scale: logit scale (1/sqrt(C) in the standard parameterization)
    :return: [B, T, H·C] in qkv's dtype
    """
    b, t, width = qkv.shape
    assert width % (3 * n_heads) == 0, (
        f"packed qkv width {width} not divisible by 3·{n_heads}")
    return _fused_packed(qkv, n_heads, float(scale), interpret)


def fused_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    scale: float, interpret: bool = False,
) -> jax.Array:
    """softmax(scale · Q Kᵀ) V with the whole instance VMEM-resident.

    :param q/k/v: [B, H, T, d] (any float dtype; softmax runs in f32)
    :param scale: logit scale (1/sqrt(d) in the standard parameterization)
    :return: [B, H, T, d] in q's dtype
    """
    b, h, t, d = q.shape
    merge = lambda x: x.reshape(b * h, t, d)  # noqa: E731
    out = _fused(merge(q), merge(k), merge(v), float(scale), interpret)
    return out.reshape(b, h, t, d)
