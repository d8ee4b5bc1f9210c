"""Models (reference: ot_vae_lightning/model/)."""
from ot_vae_tpu.models.auto_diffusion import AutoDiffusion, AutoDiffusionNet
from ot_vae_tpu.models.base import VisionModel, accepted_call_args, filter_kwargs
from ot_vae_tpu.models.dad import DAD, DADNet
from ot_vae_tpu.models.vae import VAE, VAENet

__all__ = [
    "VisionModel",
    "VAE",
    "VAENet",
    "AutoDiffusion",
    "AutoDiffusionNet",
    "DAD",
    "DADNet",
    "accepted_call_args",
    "filter_kwargs",
]
