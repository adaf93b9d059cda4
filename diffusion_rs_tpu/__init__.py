"""diffusion_rs_tpu — a TPU-native diffusion inference framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
EricLBuehler/diffusion-rs: FLUX.1 (dev/schnell) text-to-image with T5-XXL +
CLIP text encoding, flow-match Euler sampling, VAE decode, first-class
quantized inference (bitsandbytes nf4/fp4/int8 and GGUF 2-8 bit), DDUF /
safetensors / GGUF loading, host-offload, and a Pipeline front-end API
mirroring the reference's pyo3 module (diffusion_rs_py/src/lib.rs:82-155).
"""

__version__ = "0.1.0"

from .pipelines.api import (  # noqa: F401
    Pipeline,
    ModelSource,
    DiffusionGenerationParams,
    Offloading,
    ModelDType,
)
