"""TPU-native learned image-compression engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
FPGA-HLS codebase (`shengjie-chen/simple_image_compression_network`): the
8-layer quantized conv autoencoder with bit-exact integer semantics, plus the
codec stack the reference lacks (uniform quantization, GDN, hyperprior entropy
model, range coding) and multi-chip spatial sharding over a `jax.sharding.Mesh`.
"""

from . import config  # noqa: F401

__version__ = "0.1.0"
