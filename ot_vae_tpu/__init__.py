"""ot-vae-tpu: TPU-native (JAX/XLA/Pallas/pjit) framework for training
Variational Auto-Encoders with Optimal-Transport latent operators.

Brand-new TPU-first implementation of the capabilities of
``theoad/ot-vae-lightning`` (reference mounted at /root/reference).
"""

__version__ = "0.1.0"
