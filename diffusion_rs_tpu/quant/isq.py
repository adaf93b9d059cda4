"""In-situ quantization (ISQ): quantize dense weights at load time.

Reference parity: `IsqType` (diffusion_rs_backend/src/lib.rs:88-149) maps a
requested type to a GGML dtype and quantizes UnquantLinear weights in place.
Here `isq_quantize` converts a dense K-major Linear weight into the canonical
QuantizedTensor for any supported target, so a full-precision checkpoint can
run through the fused dequant-matmul kernels without a pre-quantized file.
"""

from __future__ import annotations

from typing import Union

import numpy as np
import jax
import jax.numpy as jnp

from .bnb import quantize_nf4
from .gguf_quants import ENCODERS, gguf_to_canonical
from .qtensor import QuantizedTensor

# reference IsqType::Q4_0/Q4K/Q6K/Q8_0/... (CUDA-legal subset, lib.rs:102-128)
SUPPORTED = ("q4_0", "q8_0", "q4_k", "q6_k", "nf4")


def isq_quantize_weight(
    w_kmajor: Union[np.ndarray, jnp.ndarray], target: str
) -> QuantizedTensor:
    """Quantize a dense K-major [K, N] weight to ``target``."""
    if target not in SUPPORTED:
        raise ValueError(f"ISQ target {target!r} not in {SUPPORTED}")
    w = np.asarray(jax.device_get(w_kmajor), np.float32)
    k, n = w.shape
    w_torch = np.ascontiguousarray(w.T)  # [out, in] for the encoders
    if target == "nf4":
        return quantize_nf4(w_torch, blocksize=64)
    raw = ENCODERS[target](w_torch)
    return gguf_to_canonical(target, raw, (n, k))


def isq_tree(params, target: str, min_features: int = 512):
    """Quantize every dense Linear in a param pytree whose weight is at least
    ``min_features`` on both dims (embedders/norms stay dense, mirroring the
    reference's per-linear ISQ over QuantizedModelLayer aggregates)."""
    from ..ops.linear import Linear  # deferred: ops imports quant

    def visit(node):
        if isinstance(node, Linear) and isinstance(node.w, jax.Array) \
                and node.w.ndim >= 2:
            k, n = node.w.shape[-2], node.w.shape[-1]
            if k >= min_features and n >= min_features and k % 256 == 0:
                if node.w.ndim == 2:
                    return Linear(w=isq_quantize_weight(node.w, target), b=node.b)
                # stacked [L, K, N]: quantize per layer then restack planes
                qts = [
                    isq_quantize_weight(node.w[i], target)
                    for i in range(node.w.shape[0])
                ]
                stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *qts)
                return Linear(w=stacked, b=node.b)
        return node

    return jax.tree.map(
        visit, params, is_leaf=lambda x: isinstance(x, Linear)
    )
