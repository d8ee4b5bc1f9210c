"""Modular CNN encoder/decoder stack (flax.linen, NHWC).

TPU-first re-design of the reference CNN family
(reference: ot_vae_lightning/networks/cnn.py:33-672) preserving the
capability set: norm→FiLM→act→upsample→conv→downsample layer ordering
(BigGAN-style), conditional FiLM scale/bias from class+time embeddings,
equalized learning rate, residual add/cat blocks with 1×1 skips, spatial
self-attention gated to low resolutions, and the auto-derived
channel/resolution schedule.

Layout: NHWC (channels-last — TPU lane dimension); ``out_size`` contracts are
reported as (H, W, C). Downsampling is a strided conv; upsampling is a
nearest-neighbor resize before the conv (matching the reference's effective
behavior, cnn.py:96-111), computed as the exact conv-at-source-resolution
phase decomposition (nets_utils.upsample_conv) so the upsampled tensor is
never materialized.
"""
from __future__ import annotations

import math
from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ot_vae_tpu.networks.nets_utils import (
    EqualConv,
    EqualDense,
    GaussianFourierProjection,
    Normalization,
    div_sqrt,
    get_activation,
    spatial_attention,
)

__all__ = ["ConvLayer", "ConvBlock", "AttentionBlock", "CNN", "AutoEncoder",
           "get_channel_list", "get_block_scaling"]


class ConvLayer(nn.Module):
    """norm → FiLM(embed) → act → upsample → conv(strided if down) → dropout
    (reference: networks/cnn.py:33-192)."""

    features: int
    down_sample: Union[bool, int] = False
    up_sample: Union[bool, int] = False
    additional_embed: bool = False
    normalization: Optional[str] = None
    activation: Optional[str] = None
    equalized_lr: Optional[float] = None
    dropout: float = 0.0
    kernel_size: int = 3
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, embed: Optional[jax.Array] = None, train: bool = False,
                 materialize: bool = True):
        in_features = x.shape[-1]
        groups = self.groups if (in_features % self.groups == 0 and
                                 self.features % self.groups == 0) else 1
        act = get_activation(self.activation)

        out = Normalization(self.normalization, in_features, groups,
                            dtype=self.dtype)(x, train)

        if self.additional_embed:
            if embed is None:
                raise ValueError("layer is embed-conditioned but `embed` is None")
            lr = self.equalized_lr or 1.0
            scale = EqualDense(in_features, lr_mult=lr, dtype=self.dtype)(act(embed))
            bias = EqualDense(in_features, lr_mult=lr, dtype=self.dtype)(act(embed))
            out = out * scale[:, None, None, :] + bias[:, None, None, :]

        out = act(out)

        if not materialize:
            # return the pre-conv activations plus the EFFECTIVE conv weight
            # (and bias) instead of applying the conv — the fused attention
            # block runs the contraction inside its Pallas kernel. Same
            # EqualConv construction as below → identical parameter tree.
            assert (self.kernel_size == 1 and not self.down_sample
                    and not self.up_sample and self.dropout == 0
                    and groups == 1), "materialize=False is 1×1/stride-1 only"
            w, bias = EqualConv(
                self.features, (1, 1), (1, 1), padding=[(0, 0)] * 2,
                feature_group_count=groups, use_bias=self.use_bias,
                equalized_lr=self.equalized_lr, dtype=self.dtype,
            )(out, materialize=False)
            return out, w, bias

        # nearest-neighbor upsampling is FUSED into the conv (exact phase
        # decomposition, nets_utils.upsample_conv): the ×factor² upsampled
        # tensor — 64 MB bf16 at the FFHQ128 decoder's 64²→128² block — is
        # never materialized, and 1×1 skips run factor²× fewer FLOPs
        up_factor = 0
        if self.up_sample:
            up_factor = 2 if isinstance(self.up_sample, bool) else int(self.up_sample)

        kernel, stride = self.kernel_size, 1
        if self.down_sample:
            factor = 2 if isinstance(self.down_sample, bool) else int(self.down_sample)
            kernel = max(2 * factor, kernel)
            stride = factor
        out = EqualConv(
            self.features, (kernel, kernel), (stride, stride),
            padding=[((kernel - 1) // 2, kernel // 2)] * 2 if stride > 1
            else [((kernel - 1) // 2, kernel - 1 - (kernel - 1) // 2)] * 2,
            feature_group_count=groups, use_bias=self.use_bias,
            equalized_lr=self.equalized_lr, dtype=self.dtype,
            up_sample=up_factor,
        )(out)

        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class Conv1x1(nn.Module):
    """1×1 conv (optionally normalized / resampled) used for skips and qkv
    (reference: networks/cnn.py:195-206)."""

    features: int
    down_sample: Union[bool, int] = False
    up_sample: Union[bool, int] = False
    normalization: Optional[str] = None
    additional_embed: bool = False
    equalized_lr: Optional[float] = None
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, embed: Optional[jax.Array] = None, train: bool = False,
                 materialize: bool = True):
        return ConvLayer(
            self.features, self.down_sample, self.up_sample, self.additional_embed,
            self.normalization, None, self.equalized_lr, 0.0, 1,
            self.groups, False, self.dtype,
        )(x, embed, train, materialize)


class AttentionBlock(nn.Module):
    """Spatial self-attention: 1×1 qkv → multi-head attention → 1×1 proj
    (reference: networks/cnn.py:212-240)."""

    channels: int
    heads: int = 1
    additional_embed: bool = False
    normalization: Optional[str] = None
    equalized_lr: Optional[float] = None
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, embed: Optional[jax.Array] = None, train: bool = False):
        import os

        from ot_vae_tpu.networks.nets_utils import _use_fused_attention

        b, h, w, c = x.shape
        t, head_dim = h * w, self.channels // max(self.heads, 1)
        qkv_conv = Conv1x1(
            self.channels * 3, normalization=self.normalization,
            additional_embed=self.additional_embed,
            equalized_lr=self.equalized_lr, groups=self.groups, dtype=self.dtype,
        )
        out_conv = Conv1x1(
            self.channels, equalized_lr=self.equalized_lr,
            groups=self.groups, dtype=self.dtype,
        )

        # Fully-fused block (ops/attention_pallas.fused_attention_block):
        # qkv projection + attention + out projection in one Pallas kernel —
        # qkv [T, 3C] and the attention output never round-trip HBM. OPT-IN
        # (OT_VAE_FUSED_ATTN_BLOCK=1): measured on the real v5e it LOSES to
        # the default proj + packed-kernel path (bs128 t1024 c128: 4.25 vs
        # 3.65 ms fwd+bwd; bs128 t256 c512: 3.52 vs 2.79 ms) — the weight
        # matmuls re-run per grid program instead of as one XLA-batched GEMM,
        # and that costs more than the saved qkv HBM round trip. Kept as a
        # tested alternative (the balance may flip on HBM-poorer parts).
        # Both Conv1x1 modules still own the parameters (identical tree and
        # seeded init draws); materialize=False hands their effective
        # weights to the kernel.
        blk_flag = os.environ.get("OT_VAE_FUSED_ATTN_BLOCK")
        interpret = blk_flag == "interpret"  # CPU-test escape hatch
        if (self.groups == 1 and blk_flag in ("1", "interpret")
                and (interpret
                     or _use_fused_attention(t, head_dim, jax.default_backend(),
                                             os.environ.get("OT_VAE_FUSED_ATTN")))):
            from ot_vae_tpu.ops.attention_pallas import fused_attention_block

            normed, w_qkv, b_qkv = qkv_conv(x, embed, train, materialize=False)
            dummy = jnp.zeros((1, 1, 1, self.channels), normed.dtype)
            _, w_out, b_out = out_conv(dummy, None, train, materialize=False)
            assert b_qkv is None and b_out is None  # Conv1x1 is bias-free
            out = fused_attention_block(
                normed.reshape(b, t, normed.shape[-1]), w_qkv, w_out,
                self.heads, 1.0 / math.sqrt(head_dim), interpret=interpret)
            return out.reshape(b, h, w, self.channels)

        # Matmul projections at Pallas-kernel shapes (round-5 layout fix,
        # default ON on TPU — OT_VAE_ATTN_MATMUL_PROJ=0 restores the conv
        # formulation): XLA lays 1×1-conv outputs out feature-major
        # ({3,0,2,1}-style) while the Mosaic custom call requires row-major
        # [B,T,3C], so the conv path pays a standalone 100.7 MB relayout
        # copy per step at the bs128 production point (byte_audit round 4:
        # "THE next MFU lever"). Expressing the same contraction as
        # dot_general over the flattened token stream makes every tensor at
        # the kernel boundary natively row-major — the copy is structurally
        # impossible, and the [B·T, C] relayout of the INPUT fuses into the
        # norm chain. Same params (materialize=False hands out the effective
        # equalized-LR weights), same math (1×1 conv ≡ dot over C).
        from ot_vae_tpu.networks.nets_utils import _tpu_fusion_default

        if (self.groups == 1
                and _tpu_fusion_default("OT_VAE_ATTN_MATMUL_PROJ")
                and _use_fused_attention(
                    t, head_dim, jax.default_backend(),
                    os.environ.get("OT_VAE_FUSED_ATTN"),
                    self.heads, jnp.dtype(self.dtype).itemsize)):
            from ot_vae_tpu.ops.attention_pallas import fused_attention_packed

            normed, w_qkv, b_qkv = qkv_conv(x, embed, train, materialize=False)
            dummy = jnp.zeros((1, 1, 1, self.channels), normed.dtype)
            _, w_out, b_out = out_conv(dummy, None, train, materialize=False)
            assert b_qkv is None and b_out is None  # Conv1x1 is bias-free
            qkv = jax.lax.dot_general(
                normed.reshape(b, t, normed.shape[-1]),
                w_qkv.astype(normed.dtype), (((2,), (0,)), ((), ())))
            out = fused_attention_packed(
                qkv, self.heads, 1.0 / math.sqrt(head_dim))
            out = jax.lax.dot_general(
                out, w_out.astype(out.dtype), (((2,), (0,)), ((), ())))
            return out.reshape(b, h, w, self.channels)

        qkv = qkv_conv(x, embed, train)
        out = spatial_attention(qkv.reshape(b, h * w, 3 * c), self.heads)
        out = out.reshape(b, h, w, c)
        return out_conv(out, None, train)


class ConvBlock(nn.Module):
    """Resampling layer + (n_layers-1) fixed layers + optional attention, with
    residual add/cat through a 1×1 skip (reference: networks/cnn.py:246-335)."""

    features: int
    n_attn_heads: int = 0
    n_layers: int = 2
    down_sample: Union[bool, int] = False
    up_sample: Union[bool, int] = False
    additional_embed: bool = False
    normalization: Optional[str] = "batchnorm"
    activation: Optional[str] = "relu"
    residual: Optional[str] = None
    equalized_lr: Optional[float] = None
    dropout: float = 0.0
    kernel_size: int = 3
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, embed: Optional[jax.Array] = None, train: bool = False):
        embed_features = self.features // 2 if self.residual == "cat" else self.features
        out = ConvLayer(
            embed_features, self.down_sample, self.up_sample, self.additional_embed,
            self.normalization, self.activation, self.equalized_lr, self.dropout,
            self.kernel_size, self.groups, self.use_bias, self.dtype,
        )(x, embed, train)
        for _ in range(self.n_layers - 1):
            out = ConvLayer(
                embed_features, False, False, self.additional_embed,
                self.normalization, self.activation, self.equalized_lr, self.dropout,
                self.kernel_size, self.groups, self.use_bias, self.dtype,
            )(out, embed, train)
        if self.n_attn_heads > 0:
            out = out + AttentionBlock(
                embed_features, self.n_attn_heads, self.additional_embed,
                self.normalization, self.equalized_lr, self.groups, self.dtype,
            )(out, embed, train)

        if self.residual in ("cat", "add"):
            skip = Conv1x1(
                embed_features, self.down_sample, self.up_sample,
                self.normalization, False, self.equalized_lr, self.groups, self.dtype,
            )(x, None, train)
            if self.residual == "cat":
                return jnp.concatenate([out, skip], axis=-1)
            return out + skip
        return out


def get_block_scaling(max_resolution: int, min_resolution: int, max_scaling: int) -> List[int]:
    """Consecutive per-block scaling factors from high to low resolution
    (reference: networks/cnn.py:605-621). get_block_scaling(64, 2, 4) → [4, 4, 2]."""
    log_res_ratio = int(math.log2(max_resolution // min_resolution))
    log_scale = int(math.log2(max_scaling))
    mapping: List[int] = []
    while log_res_ratio > 0:
        mapping.extend([int(2**log_scale)] * (log_res_ratio // log_scale))
        log_res_ratio %= log_scale
        log_scale -= 1
    return mapping


def get_channel_list(
    in_features: int, out_features: int, in_resolution: int, out_resolution: int,
    scaling_factor: int, capacity: int,
) -> Tuple[List[int], List[int]]:
    """Channel/resolution schedule: channels double per block as resolution
    drops (reference: networks/cnn.py:627-654)."""
    factors = get_block_scaling(in_resolution, out_resolution, scaling_factor)
    features = [max(min(2**i * capacity, out_features), in_features)
                for i, _ in enumerate(factors)]
    resolutions = [in_resolution]
    for sf in factors:
        resolutions.append(resolutions[-1] // sf)
    features[-1] = out_features
    features = [in_features] + features
    return features, resolutions


def _plan_cnn(
    in_features, out_features, in_resolution, out_resolution,
    intermediate_features, capacity, max_attn_res, down_sample, up_sample,
):
    """Resolve the block plan: (features list, attn resolutions, sampling)."""
    if bool(up_sample) and bool(down_sample):
        raise ValueError("Both `up_sample` and `down_sample` are set.")
    if intermediate_features is not None:
        features = [in_features] + list(intermediate_features) + [out_features]
        attn_res = [max_attn_res + 1] * len(features)  # unknown extent: no attention
        return features, attn_res
    if not (in_resolution and out_resolution and (bool(up_sample) or bool(down_sample))):
        raise ValueError(
            "Set `in_resolution`, `out_resolution` and (`up_sample` or `down_sample`)"
            " to infer the block plan, or pass `intermediate_features`."
        )
    if bool(down_sample):
        if in_resolution <= out_resolution:
            raise ValueError("`down_sample` set but `in_resolution` <= `out_resolution`")
        ds = 2 if isinstance(down_sample, bool) else int(down_sample)
        features, resolutions = get_channel_list(
            in_features, out_features, in_resolution, out_resolution, ds, capacity
        )
        return features, resolutions[1:]
    if out_resolution <= in_resolution:
        raise ValueError("`up_sample` set but `out_resolution` <= `in_resolution`")
    us = 2 if isinstance(up_sample, bool) else int(up_sample)
    features, resolutions = get_channel_list(
        out_features, in_features, out_resolution, in_resolution, us, capacity
    )
    return features[::-1], resolutions[::-1][:-1]


class CNN(nn.Module):
    """Stack of ConvBlocks with the auto channel/resolution schedule
    (reference: networks/cnn.py:341-458). ``out_size`` = (H, W, C), NHWC."""

    in_features: int
    out_features: int
    in_resolution: Optional[int] = None
    out_resolution: Optional[int] = None
    intermediate_features: Optional[Sequence[int]] = None
    capacity: int = 8
    max_attn_res: int = 16
    n_layers: int = 2
    residual: Optional[str] = None
    down_sample: Union[bool, int] = False
    up_sample: Union[bool, int] = False
    additional_embed: bool = False
    normalization: Optional[str] = "batchnorm"
    activation: Optional[str] = "relu"
    equalized_lr: Optional[float] = None
    dropout: float = 0.0
    kernel_size: int = 3
    groups: int = 1
    use_bias: bool = True
    remat: bool = False
    remat_policy: Optional[str] = None
    attn_head_dim: Optional[int] = None
    dtype: Any = jnp.float32

    @property
    def out_size(self) -> Tuple[int, int, int]:
        return (self.out_resolution, self.out_resolution, self.out_features)

    @nn.compact
    def __call__(self, x, embed: Optional[jax.Array] = None, train: bool = False):
        features, attn_res = _plan_cnn(
            self.in_features, self.out_features, self.in_resolution,
            self.out_resolution, self.intermediate_features, self.capacity,
            self.max_attn_res, self.down_sample, self.up_sample,
        )
        # per-block rematerialization trades FLOPs for HBM (jax.checkpoint);
        # turn on for high-resolution stacks that don't fit activations.
        # remat_policy picks what the backward may KEEP (everything else is
        # recomputed): "dots" / "dots_no_batch" retain matmul/conv outputs
        # (cheap elementwise chains recompute — the usual best trade at
        # large per-chip batch), "nothing" recomputes all.
        block_cls = ConvBlock
        if self.remat:
            policy = None
            if self.remat_policy:
                import jax.ad_checkpoint as adc
                policy = {
                    "dots": adc.checkpoint_policies.checkpoint_dots,
                    "dots_no_batch":
                        adc.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                    "nothing": adc.checkpoint_policies.nothing_saveable,
                }[self.remat_policy]
            block_cls = nn.remat(ConvBlock, static_argnums=(3,), policy=policy)
        for bi, (oc, r) in enumerate(zip(features[1:], attn_res)):
            # heads: reference parity is div_sqrt(C) (head_dim ≈ sqrt(C) —
            # e.g. 16 at C=512), but head_dim < 32 starves the MXU's 128-wide
            # contraction: measured ~2× slower fwd+bwd than head_dim=64 at
            # equal channels (BENCH_DETAIL.md). Set ``attn_head_dim=64`` for
            # TPU-efficient attention; default keeps reference behavior.
            if r > self.max_attn_res:
                heads = 0
            elif self.attn_head_dim and oc % self.attn_head_dim == 0:
                heads = max(1, oc // self.attn_head_dim)
            else:
                heads = div_sqrt(oc)
            # explicit name: nn.remat's lifted class auto-names as
            # "CheckpointConvBlock_i"; pinning "ConvBlock_i" (= the plain
            # path's auto-name) keeps the param tree IDENTICAL across the
            # remat flag, so remat is toggleable on a trained checkpoint
            x = block_cls(
                oc, heads, self.n_layers, self.down_sample, self.up_sample,
                self.additional_embed, self.normalization, self.activation,
                self.residual, self.equalized_lr, self.dropout, self.kernel_size,
                self.groups, self.use_bias, self.dtype,
                name=f"ConvBlock_{bi}",
            )(x, embed, train)
        return x


class AutoEncoder(nn.Module):
    """Encoder+decoder CNN pair with shared class/time embeddings
    (reference: networks/cnn.py:463-601). ``latent_size`` = (H, W, C)."""

    in_features: int
    latent_features: int
    in_resolution: Optional[int] = None
    latent_resolution: Optional[int] = None
    intermediate_features: Optional[Sequence[int]] = None
    capacity: int = 8
    max_attn_res: int = 16
    num_classes: Optional[int] = None
    time_embed_dim: Optional[int] = None
    double_encoded_features: bool = False
    n_layers: int = 2
    residual: Optional[str] = None
    down_up_sample: Union[bool, int] = False
    normalization: Optional[str] = "batchnorm"
    activation: Optional[str] = "relu"
    equalized_lr: Optional[float] = None
    dropout: float = 0.0
    kernel_size: int = 3
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @property
    def latent_size(self) -> Tuple[int, int, int]:
        return (
            self.latent_resolution, self.latent_resolution,
            self.latent_features * (1 + int(self.double_encoded_features)),
        )

    @property
    def _cls_embed_dim(self) -> Optional[int]:
        if not self.num_classes:
            return None
        return 2 ** (int(math.log10(self.num_classes)) + 5)

    @property
    def _embed_dim(self) -> Optional[int]:
        dims = [d for d in (self._cls_embed_dim, self.time_embed_dim) if d]
        return sum(dims) if dims else None

    def setup(self):
        if self.num_classes:
            self.class_embed = nn.Embed(self.num_classes, self._cls_embed_dim,
                                        dtype=self.dtype)
        if self.time_embed_dim:
            self.time_embed = GaussianFourierProjection(
                self.time_embed_dim, self.time_embed_dim, dtype=self.dtype
            )
        common = dict(
            intermediate_features=self.intermediate_features, capacity=self.capacity,
            max_attn_res=self.max_attn_res, n_layers=self.n_layers,
            residual=self.residual, additional_embed=self._embed_dim is not None,
            normalization=self.normalization, activation=self.activation,
            equalized_lr=self.equalized_lr, dropout=self.dropout,
            kernel_size=self.kernel_size, groups=self.groups,
            use_bias=self.use_bias, dtype=self.dtype,
        )
        self.encoder = CNN(
            self.in_features,
            self.latent_features * (1 + int(self.double_encoded_features)),
            self.in_resolution, self.latent_resolution,
            down_sample=self.down_up_sample, **common,
        )
        dec_common = dict(common)
        if self.intermediate_features is not None:
            dec_common["intermediate_features"] = list(self.intermediate_features)[::-1]
        self.decoder = CNN(
            self.latent_features, self.in_features,
            self.latent_resolution, self.in_resolution,
            up_sample=self.down_up_sample, **dec_common,
        )

    def embed(self, labels=None, time=None):
        """Joint class+time embedding (reference: networks/cnn.py:563-591)."""
        parts = []
        if self.num_classes:
            if labels is None:
                raise ValueError("`num_classes` set but `labels` is None")
            parts.append(self.class_embed(labels))
        if self.time_embed_dim:
            if time is None:
                raise ValueError("`time_embed_dim` set but `time` is None")
            parts.append(self.time_embed(time))
        if not parts:
            return None
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    def encode(self, x, labels=None, time=None, train: bool = False):
        return self.encoder(x, self.embed(labels, time), train)

    def decode(self, z, labels=None, time=None, train: bool = False):
        return self.decoder(z, self.embed(labels, time), train)

    def __call__(self, x, labels=None, time=None, train: bool = False):
        z = self.encode(x, labels, time, train)
        if self.double_encoded_features:
            # keep the mean half — the log-variance half belongs to the prior's
            # reparametrization (the reference's forward breaks here,
            # networks/cnn.py:599-600)
            z = z[..., : self.latent_features]
        return self.decode(z, labels, time, train)
