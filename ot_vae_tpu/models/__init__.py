"""Models (reference: ot_vae_lightning/model/)."""
from ot_vae_tpu.models.base import VisionModel, accepted_call_args, filter_kwargs
from ot_vae_tpu.models.vae import VAE, VAENet

__all__ = ["VisionModel", "VAE", "VAENet", "accepted_call_args", "filter_kwargs"]
