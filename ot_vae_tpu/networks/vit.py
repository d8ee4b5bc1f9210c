"""Generalized encoder/decoder ViT (flax.linen).

TPU-first re-design of the reference ViT
(reference: ot_vae_lightning/networks/vit.py:33-261): token streams
(input / embed / class / time) with static index bookkeeping, patchify /
unpatchify via einops, learned positional embeddings, optional
cross-attention decoder (``preprocess_depth``), causal masking for
autoregressive use, and the ``AutoRegressive`` head (vocab embedding + LM
head). Transformer blocks are post-LN (torch ``nn.TransformerEncoderLayer``
semantics) built from flax attention — fused QKV projections land on the MXU.

Layout: images are NHWC; ``out_size`` is (H, W, C) when ``embed_to_patch``
else (tokens, dim).
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange
from flax import linen as nn

from ot_vae_tpu.networks.nets_utils import (GaussianFourierProjection,
                                            mha_attention_fn)

__all__ = ["PositionalEmbedding", "TransformerLayer", "ViT", "AutoRegressive"]


def pair(t):
    return t if isinstance(t, (tuple, list)) else (t, t)


class PositionalEmbedding(nn.Module):
    """Learned positional embedding + LayerNorm + dropout
    (reference: networks/vit.py:33-57)."""

    max_length: int
    d_model: int
    dropout: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, positions=None):
        """``positions`` overrides the default ``arange(T)`` position ids —
        used by the KV-cached single-token decode path, where ``x`` holds one
        token whose absolute position the caller tracks."""
        if x.shape[-1] != self.d_model:
            raise ValueError("feature dim of `x` must equal d_model")
        idx = jnp.arange(x.shape[-2]) if positions is None else jnp.asarray(positions)
        pos = nn.Embed(self.max_length, self.d_model, dtype=self.dtype)(idx)
        h = nn.LayerNorm(dtype=self.dtype)(x + pos)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class TransformerLayer(nn.Module):
    """Post-LN transformer block: self-attn (+ optional cross-attn) + MLP
    (torch ``nn.TransformerEncoder/DecoderLayer`` capability)."""

    dim: int
    heads: int
    mlp_dim: int
    dropout: float = 0.0
    cross: bool = False
    causal: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, memory=None, mask=None, train: bool = False,
                 decode: bool = False):
        # attention_fn routes self-attention through the BTHD Pallas kernel
        # at T ≥ 512 on TPU (nets_utils.mha_attention_fn) — including
        # train-mode attention-weight DROPOUT (broadcast multiplier) and,
        # via ``causal_hint``, the causally-masked AR stack (the layer
        # statically knows its mask is lower-triangular, so the kernel
        # applies it in VMEM instead of reading a [T,T] mask operand and
        # falling back to stock). Decode-cache single-token calls are
        # shape-ineligible and take the stock flax path. Params and module
        # tree are identical either way.
        import functools

        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, dtype=self.dtype,
            dropout_rate=self.dropout, deterministic=not train,
            decode=decode,  # flax KV cache ('cache' collection) for AR decode
            attention_fn=functools.partial(mha_attention_fn,
                                           causal_hint=self.causal),
        )
        h = attn(x, x, mask=mask)
        x = nn.LayerNorm(dtype=self.dtype)(
            x + nn.Dropout(self.dropout, deterministic=not train)(h)
        )
        if self.cross:
            if memory is None:
                raise ValueError("cross-attention layer requires `memory`")
            cross_attn = nn.MultiHeadDotProductAttention(
                num_heads=self.heads, dtype=self.dtype,
                dropout_rate=self.dropout, deterministic=not train,
                attention_fn=mha_attention_fn,  # cross lengths route too
            )
            h = cross_attn(x, memory)
            x = nn.LayerNorm(dtype=self.dtype)(
                x + nn.Dropout(self.dropout, deterministic=not train)(h)
            )
        h = nn.Dense(self.mlp_dim, dtype=self.dtype)(x)
        h = nn.Dense(self.dim, dtype=self.dtype)(
            nn.Dropout(self.dropout, deterministic=not train)(jax.nn.relu(h))
        )
        return nn.LayerNorm(dtype=self.dtype)(
            x + nn.Dropout(self.dropout, deterministic=not train)(h)
        )


class ViT(nn.Module):
    """Generalized ViT with input/embed/class/time token streams
    (reference: networks/vit.py:61-248)."""

    image_size: Union[int, Tuple[int, int]]
    dim: int
    patch_size: Optional[Union[int, Tuple[int, int]]] = None
    depth: int = 6
    preprocess_depth: Optional[int] = None
    heads: int = 8
    head_dim: Optional[int] = None
    mlp_dim: Optional[int] = None
    channels: int = 3
    dropout: float = 0.1
    emb_dropout: float = 0.0
    n_embed_tokens: Optional[int] = 1
    n_input_tokens: Optional[int] = None
    output_tokens: Union[str, Sequence[str]] = "embed"
    patch_to_embed: bool = True
    embed_to_patch: bool = False
    num_classes: Optional[int] = None
    time_dependant: bool = False
    causal_mask: bool = False
    dtype: Any = jnp.float32

    # -------------------------------------------------- static token plan

    @property
    def n_heads(self) -> int:
        """Head count, optionally derived from ``head_dim`` — the CNN path's
        ``attn_head_dim`` lesson (BENCH_DETAIL.md: head_dim ≥ 64 runs ~2×
        faster than many small heads at equal channels on the MXU) exposed
        on the ViT family. ``head_dim`` wins over ``heads`` when set."""
        if self.head_dim is None:
            return self.heads
        if self.dim % self.head_dim:
            raise ValueError(f"dim {self.dim} not divisible by head_dim "
                             f"{self.head_dim}")
        return self.dim // self.head_dim

    @property
    def _plan(self):
        image_h, image_w = pair(self.image_size)
        patch = self.patch_size
        if patch is None:
            patch = (min(image_h // 4, 16), min(image_w // 4, 16))
        patch_h, patch_w = pair(patch)
        if image_h % patch_h or image_w % patch_w:
            raise ValueError("Image dimensions must be divisible by the patch size.")
        n_patch_h, n_patch_w = image_h // patch_h, image_w // patch_w
        num_patches = n_patch_h * n_patch_w
        patch_dim = self.channels * patch_h * patch_w
        n_tokens = {
            "input": num_patches if self.n_input_tokens is None else self.n_input_tokens,
            "embed": num_patches if self.n_embed_tokens is None else self.n_embed_tokens,
            "class": int(self.num_classes is not None),
            "time": int(self.time_dependant),
        }
        token_indices, cur = {}, 0
        for k, n in n_tokens.items():
            token_indices[k] = list(range(cur, cur + n))
            cur += n
        out_types = [self.output_tokens] if isinstance(self.output_tokens, str) \
            else list(self.output_tokens)
        if not all(t in token_indices for t in out_types):
            raise ValueError(f"`output_tokens` must be within {list(token_indices)}")
        out_idx, cross_idx = [], []
        for k, idx in token_indices.items():
            (out_idx if k in out_types else cross_idx).extend(idx)
        return dict(
            image=(image_h, image_w), patch=(patch_h, patch_w),
            n_patch=(n_patch_h, n_patch_w), num_patches=num_patches,
            patch_dim=patch_dim, n_tokens=n_tokens, total=cur,
            out_idx=out_idx, cross_idx=cross_idx,
        )

    @property
    def total_num_tokens(self) -> int:
        return self._plan["total"]

    @property
    def num_patches(self) -> int:
        return self._plan["num_patches"]

    @property
    def out_size(self) -> Tuple[int, ...]:
        p = self._plan
        if self.embed_to_patch:
            return (*p["image"], self.channels)  # (H, W, C)
        return (len(p["out_idx"]), self.dim)

    # -------------------------------------------------- forward

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        labels: Optional[jax.Array] = None,
        time: Optional[jax.Array] = None,
        train: bool = False,
        decode: bool = False,
        positions: Optional[jax.Array] = None,
    ) -> jax.Array:
        p = self._plan
        mlp_dim = self.mlp_dim or self.dim * 4

        if decode:
            # KV-cached autoregressive decode path (SURVEY §7: "AR sampling
            # as lax.scan with KV reuse"). Uses flax's attention 'cache'
            # collection: the first full-length call creates zeroed
            # [B, T, heads, head_dim] caches per layer (and runs a normal
            # causally-masked forward); subsequent single-token calls update
            # the cache at the internal cache_index and attend over it.
            # Trailing embed/class/time token streams are omitted entirely:
            # they sit AFTER the input tokens, so under the causal mask they
            # can never influence input-token outputs — the full path's
            # logits for the input stream are identical without them.
            if not self.causal_mask or self.preprocess_depth is not None:
                raise ValueError(
                    "decode=True requires causal_mask=True and no "
                    "cross-attention preprocess stage"
                )
            if self.patch_to_embed:
                raise ValueError("decode=True expects token embeddings, not images")
            x = PositionalEmbedding(p["total"], self.dim, self.emb_dropout,
                                    self.dtype)(x, train, positions=positions)
            mask = jnp.tril(jnp.ones((x.shape[1], x.shape[1]), bool))[None, None]
            for _ in range(self.depth):
                x = TransformerLayer(self.dim, self.n_heads, mlp_dim, self.dropout,
                                     causal=True,
                                     dtype=self.dtype)(x, mask=mask, train=train,
                                                       decode=True)
            return x

        if self.patch_to_embed:
            x = rearrange(
                x, "b (h p1) (w p2) c -> b (h w) (p1 p2 c)",
                p1=p["patch"][0], p2=p["patch"][1],
            )
            x = nn.Dense(self.dim, dtype=self.dtype, name="patch_proj")(x)

        # token streams, in the fixed order input|embed|class|time
        if p["n_tokens"]["embed"] > 0:
            embed_token = self.param(
                "embed_token", nn.initializers.normal(1.0),
                (1, p["n_tokens"]["embed"], self.dim), self.dtype,
            )
            x = jnp.concatenate(
                [x, jnp.broadcast_to(embed_token, (x.shape[0], *embed_token.shape[1:]))],
                axis=1,
            )
        if self.num_classes is not None:
            if labels is None:
                raise ValueError("`num_classes` set but `labels` is None")
            cls = nn.Embed(self.num_classes, self.dim, dtype=self.dtype,
                           name="class_token")(labels)
            x = jnp.concatenate([x, cls[:, None, :]], axis=1)
        if self.time_dependant:
            if time is None:
                raise ValueError("`time_dependant` set but `time` is None")
            t = GaussianFourierProjection(self.dim, trainable=True,
                                          name="time_token")(time)
            x = jnp.concatenate([x, t[:, None, :]], axis=1)

        x = PositionalEmbedding(p["total"], self.dim, self.emb_dropout,
                                self.dtype)(x, train)

        def causal(n):
            if not self.causal_mask:
                return None
            return jnp.tril(jnp.ones((n, n), bool))[None, None]

        out_idx = jnp.asarray(p["out_idx"])
        if self.preprocess_depth is None:
            for _ in range(self.depth):
                x = TransformerLayer(self.dim, self.n_heads, mlp_dim, self.dropout,
                                     causal=self.causal_mask,
                                     dtype=self.dtype)(x, mask=causal(x.shape[1]),
                                                       train=train)
            out = jnp.take(x, out_idx, axis=1)
        else:
            memory = jnp.take(x, jnp.asarray(p["cross_idx"]), axis=1)
            for _ in range(self.preprocess_depth):
                memory = TransformerLayer(self.dim, self.n_heads, mlp_dim,
                                          self.dropout, dtype=self.dtype)(
                    memory, train=train)
            out = jnp.take(x, out_idx, axis=1)
            for _ in range(self.depth):
                out = TransformerLayer(self.dim, self.n_heads, mlp_dim, self.dropout,
                                       cross=True, causal=self.causal_mask,
                                       dtype=self.dtype)(
                    out, memory=memory, mask=causal(out.shape[1]), train=train)

        if self.embed_to_patch:
            out = out[:, -p["num_patches"]:]
            out = nn.Dense(p["patch_dim"], dtype=self.dtype, name="unpatch_proj")(out)
            out = rearrange(
                out, "b (h w) (p1 p2 c) -> b (h p1) (w p2) c",
                h=p["n_patch"][0], p1=p["patch"][0], p2=p["patch"][1],
            )
        return out


class AutoRegressive(ViT):
    """Token-level AR model: vocab embedding + ViT trunk + LM head
    (reference: networks/vit.py:251-261)."""

    vocab_size: int = 0

    @nn.compact
    def __call__(self, tokens, labels=None, time=None, train: bool = False,
                 decode: bool = False, positions=None):
        assert self.vocab_size > 0, "`vocab_size` must be set"
        embeds = nn.Embed(self.vocab_size, self.dim, dtype=self.dtype,
                          name="vocab_embed")(tokens)
        hs = ViT.__call__(self, embeds, labels, time, train,
                          decode=decode, positions=positions)
        return nn.Dense(self.vocab_size, dtype=self.dtype, name="lm_head")(hs)
