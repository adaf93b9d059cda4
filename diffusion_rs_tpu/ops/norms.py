"""Normalization ops.

TPU-first versions of the reference's fused norm kernels
(diffusion_rs_common/src/nn/ops.rs:955 rms_norm, :1211 layer_norm;
 nn/layer_norm.rs). On TPU these are VPU-bound elementwise+reduce ops that XLA
fuses into neighbouring matmuls, so the right design is a *numerics contract*
(f32 accumulation regardless of activation dtype, like the reference's
dtype-upcast paths) rather than a hand kernel.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    bias: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """LayerNorm over the last axis, f32 accumulation.

    ``weight=None`` covers the reference FLUX blocks' parameter-free
    LayerNorms (models/flux/model.rs:33-38 builds them with ones/zeros).
    """
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.square(xf - mean).mean(axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y.astype(dt)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with f32 accumulation then cast back (T5LayerNorm semantics,
    models/t5/mod.rs:94-120; FLUX QkNorm, models/flux/model.rs:186-210)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.square(xf).mean(axis=-1, keepdims=True)
    y = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return y.astype(dt) * weight


def group_norm(
    x_nhwc: jnp.ndarray, num_groups: int, weight: jnp.ndarray, bias: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """GroupNorm over an NHWC tensor (VAE path; reference nn/group_norm.rs).

    Channels-last is the native TPU conv layout; stats are computed over
    (H, W, C/G) in f32.
    """
    b, h, w, c = x_nhwc.shape
    g = num_groups
    dt = x_nhwc.dtype
    xf = x_nhwc.astype(jnp.float32).reshape(b, h * w, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = jnp.square(xf - mean).mean(axis=(1, 3), keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y.reshape(b, h, w, c).astype(dt)
    return y * weight + bias
