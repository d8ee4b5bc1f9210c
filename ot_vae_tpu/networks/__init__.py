"""Networks: modular CNN + generalized ViT (flax.linen, NHWC)
(reference: ot_vae_lightning/networks/)."""
from ot_vae_tpu.networks.cnn import (
    CNN,
    AttentionBlock,
    AutoEncoder,
    ConvBlock,
    ConvLayer,
    get_block_scaling,
    get_channel_list,
)
from ot_vae_tpu.networks.nets_utils import (
    EqualConv,
    EqualDense,
    GaussianFourierProjection,
    div_sqrt,
    spatial_attention,
)
from ot_vae_tpu.networks.vit import AutoRegressive, PositionalEmbedding, TransformerLayer, ViT

__all__ = [
    "ConvLayer",
    "ConvBlock",
    "AttentionBlock",
    "CNN",
    "AutoEncoder",
    "get_channel_list",
    "get_block_scaling",
    "EqualConv",
    "EqualDense",
    "GaussianFourierProjection",
    "div_sqrt",
    "spatial_attention",
    "ViT",
    "AutoRegressive",
    "PositionalEmbedding",
    "TransformerLayer",
]
