from .qtensor import (
    QuantizedTensor,
    dequantize,
    pack4,
    unpack4_jnp,
    unpack4_np,
    choose_split,
    quantize_q4_0,
    quantize_q8_0,
)
from . import bnb, gguf_quants
from .isq import isq_quantize_weight, isq_tree

__all__ = [
    "isq_quantize_weight",
    "isq_tree",
    "QuantizedTensor",
    "dequantize",
    "pack4",
    "unpack4_jnp",
    "unpack4_np",
    "choose_split",
    "quantize_q4_0",
    "quantize_q8_0",
    "bnb",
    "gguf_quants",
]
