"""Transport operators + LatentTransport callback
(reference: ot_vae_lightning/ot/transport/ + ot/transport_callback.py)."""
from ot_vae_tpu.transport.base import TransportOperator
from ot_vae_tpu.transport.callback import ConditionalLatentTransport, LatentTransport
from ot_vae_tpu.transport.discrete import DiscreteTransport, DiscreteTransportState
from ot_vae_tpu.transport.gaussian import GaussianTransport, GaussianTransportState
from ot_vae_tpu.transport.gmm import GMMTransport, GMMTransportState

__all__ = [
    "TransportOperator",
    "GaussianTransport",
    "GaussianTransportState",
    "GMMTransport",
    "GMMTransportState",
    "DiscreteTransport",
    "DiscreteTransportState",
    "LatentTransport",
    "ConditionalLatentTransport",
]
