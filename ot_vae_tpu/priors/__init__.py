"""Priors (reference: ot_vae_lightning/prior/)."""
from ot_vae_tpu.priors.base import PriorModule, annealing_coeff, empirical_reverse_kl
from ot_vae_tpu.priors.codebook import CodebookPrior
from ot_vae_tpu.priors.conditional_gaussian import ConditionalGaussianPrior
from ot_vae_tpu.priors.gaussian import GaussianPrior

__all__ = [
    "PriorModule",
    "annealing_coeff",
    "empirical_reverse_kl",
    "GaussianPrior",
    "ConditionalGaussianPrior",
    "CodebookPrior",
]
