"""Streaming-fit distribution models as pytree states
(reference: ot_vae_lightning/ot/distribution_models/)."""
from ot_vae_tpu.distributions.codebook import (
    Assignment,
    CodebookModel,
    CodebookState,
    assign_from_energy,
)
from ot_vae_tpu.distributions.gaussian import GaussianModel, GaussianParams, GaussianState
from ot_vae_tpu.distributions.gmm import GMMModel, GMMParams, GMMState

__all__ = [
    "GaussianModel",
    "GaussianState",
    "GaussianParams",
    "CodebookModel",
    "CodebookState",
    "Assignment",
    "assign_from_energy",
    "GMMModel",
    "GMMState",
    "GMMParams",
]
