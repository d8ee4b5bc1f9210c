"""Data layer: datamodules, transforms, synthetic fallbacks
(reference: ot_vae_lightning/data/)."""
from ot_vae_tpu.data.base import ArrayDataset, BaseDatamodule, dataset_split
from ot_vae_tpu.data.progressive import PgCompose, PgTransform, ProgressiveTransform
from ot_vae_tpu.data.datasets import (CIFAR10, FFHQ64, FFHQ128, GenericDatamodule, ImageFolderData, ImageNet224, ImageNet256, MNIST, MNIST32)
from ot_vae_tpu.data.synthetic import synthetic_digits, synthetic_textures
from ot_vae_tpu.data.transforms import (
    CenterCrop,
    Compose,
    GaussianBlur,
    GaussianNoise,
    Identity,
    Normalize,
    Pad,
    RandomHorizontalFlip,
    Transform,
    UnNormalize,
    from_spec,
    to_spec,
)

__all__ = [
    "ArrayDataset",
    "BaseDatamodule",
    "dataset_split",
    "MNIST",
    "MNIST32",
    "CIFAR10",
    "GenericDatamodule",
    "ImageFolderData",
    "ImageNet224",
    "ImageNet256",
    "FFHQ64",
    "FFHQ128",
    "PgTransform",
    "PgCompose",
    "ProgressiveTransform",
    "synthetic_digits",
    "synthetic_textures",
    "Transform",
    "Compose",
    "Identity",
    "Normalize",
    "UnNormalize",
    "Pad",
    "CenterCrop",
    "RandomHorizontalFlip",
    "GaussianBlur",
    "GaussianNoise",
    "to_spec",
    "from_spec",
]
